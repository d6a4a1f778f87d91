#!/bin/bash
# Round-5 Netflix-scale F=300 protocol cells (VERDICT r4 item 2): the
# reference grid's netflix x {5000,10000} x 300 cells (cu2rec.sh:8-10)
# on the planted 100.5M-rating dataset, both SGD policies, plus one ALS
# and one iALS sweep set — exercising the SCALING.md §ALS counterpart
# replication worst case (F=300 user table, 584 MB) for real.
#
# Expects the dataset pre-generated in /tmp/planted_netflix
# (cu2rec-synth --preset netflix + cu2rec-split; run_planted does this
# when --skip-gen is absent).  Appends per-cell JSONL to results/.
set -ex
cd "$(dirname "$0")/.."
W=${W:-/tmp/planted_netflix}
P="python experiments/run_planted.py --preset netflix --workdir $W \
   --skip-gen --factors 300"
$P --iterations 5000  --algo sgd --collision twin       --tag=-f300-twin-5k
$P --iterations 10000 --algo sgd --collision twin       --tag=-f300-twin-10k
$P --iterations 5000  --algo sgd --collision first_wins --tag=-f300-fw-5k
$P --iterations 10000 --algo sgd --collision first_wins --tag=-f300-fw-10k
$P --iterations 5 --algo als  --reg 0.02 --tag=-f300-als
$P --iterations 3 --algo ials --reg 0.1  --tag=-f300-ials
