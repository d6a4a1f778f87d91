#!/bin/bash
# Post-main-queue TPU work, strictly sequential:
#   1. ML-20M makeup cells (failed on the stale native lib in the main run)
#   2. full reference-grid protocol
#   3. gather/transaction roofline probe
set -x
cd /root/repo

bash experiments/r2_makeup_queue.sh

bash experiments/r2_grid_queue.sh

timeout 3600 python experiments/gather_roofline.py
