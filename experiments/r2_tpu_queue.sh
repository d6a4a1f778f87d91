#!/bin/bash
# Sequential round-2 TPU measurement queue — ONE TPU job at a time
# (the tunneled runtime serializes clients and wedges if two overlap or
# one is killed mid-RPC; generous per-job timeouts).
set -x
cd /root/repo
mkdir -p results

# 1. planted ML-20M: SGD twin, reference-default 5000 iters, F=50
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 5000 --factors 50 --collision twin --tag=-twin

# 2. planted ML-20M: SGD first_wins (parity semantics), same cell
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 5000 --factors 50 --collision first_wins --skip-gen \
  --tag=-fw

# 3. planted ML-20M: ALS, 10 sweeps, ALS-appropriate reg
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 10 --factors 50 --algo als --reg 0.1 --skip-gen --tag=-als

# 4. serving probe: 1M-item catalog QPS + batched fold-in
timeout 3600 python experiments/serve_probe.py

# 5. planted Netflix: SGD twin, 5000 iters (subsampled evals at 100M)
timeout 9000 python experiments/run_planted.py --preset netflix \
  --iterations 5000 --factors 50 --collision twin \
  --test-eval-sample 5000000 --tag=-twin

# 6. planted Netflix: ALS, 5 sweeps (device-extracted buckets)
timeout 9000 python experiments/run_planted.py --preset netflix \
  --iterations 5 --factors 50 --algo als --reg 0.1 --skip-gen --tag=-als
