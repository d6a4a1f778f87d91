#!/bin/bash
# Resume of r2_post_queue.sh after the 11:42 session crash killed it
# mid-predict.  Remaining work, strictly sequential (ONE TPU job at a time):
#   1. makeup job 5: planted Netflix ALS diagnostic with reg=0.02
#      (the reg=0.1 cell plateaued at RMSE 0.568 vs floor 0.30)
#   2. the full reference-grid protocol (r2_grid_queue.sh)
#   3. clean gather-roofline rerun (the 09:28 numbers were taken while the
#      main queue held the serialized tunnel -> contaminated)
set -x
cd /root/repo
mkdir -p results

timeout 7200 python experiments/run_planted.py --preset netflix \
  --iterations 5 --factors 50 --algo als --reg 0.02 --skip-gen --tag=-als-r002

# BPR quality cell with real ranking signal: implicit planted ML-20M
# (the explicit planted generator draws observations independent of
# affinity, so BPR's AUC ceiling there is popularity-only ≈ 0.53 —
# docs/RESULTS.md).  Generation is CPU-side numpy inside the job.
timeout 7200 python experiments/run_planted.py --preset ml20m --implicit \
  --iterations 2000 --factors 50 --algo bpr --lr 0.05 --reg 0.002 \
  --check-error 500 --tag=-bpr-imp

# iALS on the same implicit planted data (reuses the generated split)
timeout 7200 python experiments/run_planted.py --preset ml20m --implicit \
  --iterations 6 --factors 50 --algo ials --reg 0.02 --skip-gen \
  --tag=-ials-imp

bash experiments/r2_grid_queue.sh

timeout 3600 python experiments/gather_roofline.py
