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

# 3. planted ML-20M: ALS, 6 sweeps.  reg=0.02, NOT the ML-100K optimum
# 0.1: on planted data 0.1 over-regularizes (CPU sweep: 0.02 reaches
# 0.341 vs floor 0.30 in 3 sweeps; 0.1 crawls 0.58->0.43 in 6 — the
# exact flat-curve pattern the first Netflix ALS cell showed)
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 6 --factors 50 --algo als --reg 0.02 --skip-gen --tag=-als

# 4. planted ML-20M: BPR ranking, 2000 iters (implicit-task metrics)
timeout 5400 python experiments/run_planted.py --preset ml20m \
  --iterations 2000 --factors 50 --algo bpr --lr 0.05 --reg 0.002 \
  --check-error 500 --skip-gen --tag=-bpr

# 5. diagnostic: Netflix ALS with lighter ridge (the 0.1 cell's curve was
#    flat at 0.57; ML-100K's optimum need not transfer across degree scales)
timeout 7200 python experiments/run_planted.py --preset netflix \
  --iterations 5 --factors 50 --algo als --reg 0.02 --skip-gen --tag=-als-r002
