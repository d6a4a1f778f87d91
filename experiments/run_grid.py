#!/usr/bin/env python
"""Benchmark grid runner — the reference experiment harness
(experiments/cu2rec.sh: datasets × iterations {100,500,1000,5000,10000} ×
factors {50,300}, each run timed and appended to results/{date}-{commit}).

Usage:
    python experiments/run_grid.py data/ml100k --iters 100 500 --factors 50
    python experiments/run_grid.py --dataset path/train.csv path/test.csv ...

Each cell runs the full training loop and appends a JSON record (config,
wall time, final train/test RMSE+MAE, updates/s) to
results/grid-{timestamp}-{commit}.jsonl.  Pass --profile to wrap each cell
in jax.profiler.trace (the nvprof analogue, experiments/cu2rec_prof.sh).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import datetime
import json
import os
import subprocess
import time

from cu2rec_tpu.utils.cache import enable_compile_cache

enable_compile_cache()  # remote compiles cost minutes each without it


def git_commit() -> str:
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              check=True).stdout.strip()
    except Exception:
        return "unknown"


def split_if_needed(ratings_csv: str, seed: int = 42):
    """Produce train/test files next to the dataset (90/10 split_true),
    reusing them if present."""
    fp, ext = os.path.splitext(ratings_csv)
    train_p, test_p = f"{fp}_train{ext}", f"{fp}_test{ext}"
    if not (os.path.exists(train_p) and os.path.exists(test_p)):
        from cu2rec_tpu.data.ratings import write_ratings_csv
        from cu2rec_tpu.data.split import read_rating_rows, split_true
        rows = read_rating_rows(ratings_csv)
        train, test = split_true(rows, 0.9, seed=seed)
        write_ratings_csv(train_p, train)
        write_ratings_csv(test_p, test)
    return train_p, test_p


def run_cell(train_csv: str, test_csv: str, iters: int, factors: int,
             devices: int, profile_dir: str | None,
             collision: str = "first_wins", recall_k: int = 0):
    import jax

    from cu2rec_tpu.data import build_csr, read_ratings_csv
    from cu2rec_tpu.train.trainer import train
    from cu2rec_tpu.utils.config import Config
    from cu2rec_tpu.utils.metrics import MetricsLogger

    train_rd = read_ratings_csv(train_csv)
    test_rd = read_ratings_csv(test_csv)
    # Shared id space for the two splits (see cli/mf.py).
    n_users = max(train_rd.n_users, test_rd.n_users)
    n_items = max(train_rd.n_items, test_rd.n_items)
    train_csr = build_csr(train_rd, n_users=n_users, n_items=n_items)
    test_csr = build_csr(test_rd, n_users=n_users, n_items=n_items)

    cfg = Config(total_iterations=iters, n_factors=factors,
                 check_error=max(iters // 10, 1),
                 collision_policy=collision)
    logger = MetricsLogger(verbose=False)

    engine = None
    if devices > 1:
        from cu2rec_tpu.parallel.sharded import ShardedEngine
        engine = ShardedEngine(train_csr, test_csr, cfg, n_devices=devices)

    ctx = None
    if profile_dir:
        os.makedirs(profile_dir, exist_ok=True)
        ctx = jax.profiler.trace(profile_dir)
        ctx.__enter__()
    t0 = time.perf_counter()
    _model, losses = train(train_csr, test_csr, cfg, train_rd.global_bias,
                           logger=logger, engine=engine)
    wall = time.perf_counter() - t0
    if ctx:
        ctx.__exit__(None, None, None)

    evals = [r for r in logger.history if r["event"] == "eval"]
    last = evals[-1] if evals else {}
    # the trainer's own timer excludes warmup/compile (training.cu:18-19
    # analogue); prefer it over our outer wall clock
    times = [r for r in logger.history if r["event"] == "time"]
    if times:
        wall = times[-1]["seconds"]
    recall = None
    if recall_k:
        from cu2rec_tpu.serve.recommend import recall_at_k_eval
        recall = recall_at_k_eval(_model, train_csr, test_csr, k=recall_k)
    return {
        "collision": collision,
        "profile_dir": profile_dir,
        "recall_at_k": recall,
        "train_csv": train_csv,
        "iterations": iters,
        "factors": factors,
        "devices": devices,
        "n_users": train_csr.n_users,
        "n_items": train_csr.n_items,
        "nnz": train_csr.nnz,
        "wall_s": round(wall, 3),
        "updates_per_s": round(train_csr.n_users * iters / wall, 1),
        "final": {k: last.get(k) for k in
                  ("train_rmse", "train_mae", "test_rmse", "test_mae")},
        "test_rmse_curve": losses,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("datasets", nargs="+",
                   help="ratings CSVs (auto 90/10 split) or "
                   "'train.csv:test.csv' pairs — the reference grid loops "
                   "several datasets per invocation (cu2rec.sh:8)")
    p.add_argument("--iters", type=int, nargs="+",
                   default=[100, 500, 1000, 5000, 10000])
    p.add_argument("--factors", type=int, nargs="+", default=[50, 300])
    p.add_argument("--devices", type=int, default=0)
    p.add_argument("--collision", default="first_wins",
                   choices=["first_wins", "mean", "sum", "twin"])
    p.add_argument("--recall-k", type=int, default=0)
    p.add_argument("--profile", "--profile-per-cell", action="store_true",
                   dest="profile",
                   help="wrap every (dataset, iters, factors) cell in "
                   "jax.profiler.trace with its own xplane dir — the "
                   "cu2rec_prof.sh:8-20 one-dump-per-cell protocol")
    p.add_argument("--results-dir", default="results")
    args = p.parse_args(argv)

    os.makedirs(args.results_dir, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    out_path = os.path.join(args.results_dir,
                            f"grid-{stamp}-{git_commit()}.jsonl")
    for dataset in args.datasets:
        if ":" in dataset:
            train_csv, test_csv = dataset.split(":", 1)
        else:
            train_csv, test_csv = split_if_needed(dataset)
        dstag = (os.path.basename(train_csv).replace("_train", "")
                 .rsplit(".", 1)[0])
        for factors in args.factors:
            for iters in args.iters:
                # One xplane dir per (dataset, iters, factors) cell —
                # cu2rec_prof.sh:8-20 parity (r3 dirs lacked the dataset
                # component, collapsing multi-dataset grids per scale).
                profile_dir = (os.path.join(
                    "profiles", f"{stamp}-{dstag}-i{iters}-f{factors}")
                    if args.profile else None)
                rec = run_cell(train_csv, test_csv, iters, factors,
                               args.devices, profile_dir,
                               collision=args.collision,
                               recall_k=args.recall_k)
                with open(out_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps({k: rec[k] for k in
                                  ("train_csv", "iterations", "factors",
                                   "wall_s", "updates_per_s", "final",
                                   "collision", "recall_at_k")}))
    print(f"results → {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
