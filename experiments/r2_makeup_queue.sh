#!/bin/bash
# Makeup for the ML-20M planted cells that failed on the stale native lib
# (see r2_tpu_queue.sh jobs 1-3).  ONE TPU job at a time.
set -x
cd /root/repo
mkdir -p results

# 1. planted ML-20M: SGD twin, reference-default 5000 iters, F=50
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 5000 --factors 50 --collision twin --skip-gen --tag=-twin

# 2. planted ML-20M: SGD first_wins (parity semantics), same cell
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 5000 --factors 50 --collision first_wins --skip-gen \
  --tag=-fw

# 3. planted ML-20M: ALS, 10 sweeps, ALS-appropriate reg
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 10 --factors 50 --algo als --reg 0.1 --skip-gen --tag=-als

# 4. planted ML-20M: BPR ranking, 2000 iters (implicit-task metrics)
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 2000 --factors 50 --algo bpr --lr 0.05 --reg 0.002 \
  --check-error 500 --skip-gen --tag=-bpr

# 5. diagnostic: Netflix ALS with lighter ridge (the 0.1 cell's curve was
#    flat at 0.57; ML-100K's optimum need not transfer across degree scales)
timeout 7200 python experiments/run_planted.py --preset netflix \
  --iterations 5 --factors 50 --algo als --reg 0.02 --skip-gen --tag=-als-r002
