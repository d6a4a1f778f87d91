#!/bin/bash
# Full reference grid protocol (reference experiments/cu2rec.sh:8-19):
# datasets {ml-100k real, planted ml-20m, planted netflix} ×
# iterations {100,500,1000,5000,10000} × factors {50,300}.
# ONE TPU job at a time; planted splits must already exist
# (r2_tpu_queue.sh / r2_makeup_queue.sh create them).
set -x
cd /root/repo
mkdir -p results

# ML-100K (real data): the full 5x2 grid
timeout 5400 python experiments/run_grid.py data/ml100k_ratings.csv \
  --iters 100 500 1000 5000 10000 --factors 50 300

# planted ML-20M: full grid (the >=20M-scale F=300 / 10000-iter cells)
timeout 10800 python experiments/run_grid.py \
  /tmp/planted_ml20m/ratings_train.csv:/tmp/planted_ml20m/ratings_test.csv \
  --iters 100 500 1000 5000 10000 --factors 50 300

# planted Netflix: the long cells (F=50; F=300 at 100M exceeds HBM budget
# for the packed item-major mirror — documented in docs/RESULTS.md)
timeout 10800 python experiments/run_grid.py \
  /tmp/planted_netflix/ratings_train.csv:/tmp/planted_netflix/ratings_test.csv \
  --iters 1000 5000 --factors 50

# one xplane profile per scale (single cell each)
timeout 3600 python experiments/run_grid.py data/ml100k_ratings.csv \
  --iters 1000 --factors 50 --profile
timeout 5400 python experiments/run_grid.py \
  /tmp/planted_ml20m/ratings_train.csv:/tmp/planted_ml20m/ratings_test.csv \
  --iters 1000 --factors 50 --profile
