#!/bin/bash
# Post-review-fix reruns (ONE TPU job at a time):
#  - implicit planted ML-20M cells regenerated with the deduplicated
#    generator (the pre-fix data leaked duplicate (u,i) pairs into both
#    split sides, deflating masked recall@k — tests/test_bpr.py)
#  - bench.py with the F-matched CPU twin (vs_baseline integrity fix)
set -x
cd /root/repo
mkdir -p results

timeout 7200 python experiments/run_planted.py --preset ml20m --implicit \
  --iterations 2000 --factors 50 --algo bpr --lr 0.05 --reg 0.002 \
  --check-error 500 --tag=-bpr-imp-dedup

timeout 7200 python experiments/run_planted.py --preset ml20m --implicit \
  --iterations 6 --factors 50 --algo ials --reg 0.02 --skip-gen \
  --tag=-ials-imp-dedup

timeout 3600 python bench.py | tee /tmp/bench_r2fix.json
