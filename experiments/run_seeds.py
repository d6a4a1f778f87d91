#!/usr/bin/env python
"""Run-variance study: N-seed sweeps at the flagship quality cells.

Every quality claim of the form "matches X within run variance" needs a
measured variance.  This harness re-runs the flagship cells of the
reference benchmark protocol (experiments/cu2rec.sh:8-10 grid cells;
eval contract training.cu:135-137) across N training seeds on FIXED
data — the train/test split stays the reference's seed-42 split
(split_to_test_train.py default), so the measured sigma is pure
initialization + sampling-stream variance, the quantity "within run
variance" quantifies.

Cells (default):
  * real ML-100K: SGD {twin, first_wins} x iters {5000, 10000} x
    F {50, 300}; ALS F {50, 300} (10 sweeps, lambda=0.1 — the
    docs/RESULTS.md ALS protocol).
  * planted ML-20M (cli.synth preset, data seed fixed): SGD twin
    5000 x F=50 — the at-scale flagship cell.

One JSON line per run + one per-cell summary line (mean/std/min/max)
appended to results/seeds-{date}-{commit}.jsonl.

    python experiments/run_seeds.py --seeds 10 --cells ml100k-sgd \
        ml100k-als ml20m-sgd
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# CU2REC_FORCE_CPU=1 pins the hermetic CPU backend BEFORE backend init
# (the axon TPU plugin overrides JAX_PLATFORMS at import time, so the
# plain env var does not work — same dance as tests/conftest.py).  Used
# to measure seed sigma for cells whose programs the degraded remote
# compile helper cannot build (ALS fused tiers, r4 environment note).
if os.environ.get("CU2REC_FORCE_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

from cu2rec_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


from run_grid import git_commit  # single provenance-stamp implementation


def load_pair(train_csv: str, test_csv: str):
    """Shared-id-space CSR pair (the cli/mf.py convention; also used by
    foldin_quality_probe)."""
    from cu2rec_tpu.data import build_csr, read_ratings_csv
    train_rd = read_ratings_csv(train_csv)
    test_rd = read_ratings_csv(test_csv)
    n_users = max(train_rd.n_users, test_rd.n_users)
    n_items = max(train_rd.n_items, test_rd.n_items)
    return (build_csr(train_rd, n_users=n_users, n_items=n_items),
            build_csr(test_rd, n_users=n_users, n_items=n_items),
            train_rd.global_bias)


def ensure_planted_ml20m(workdir: str):
    """Generate + split the planted ML-20M dataset once (fixed data seed,
    run_planted.py defaults) and return (train_csv, test_csv, floor)."""
    raw = os.path.join(workdir, "ratings.csv")
    train_csv = os.path.join(workdir, "ratings_train.csv")
    test_csv = os.path.join(workdir, "ratings_test.csv")
    if not os.path.exists(test_csv):
        os.makedirs(workdir, exist_ok=True)
        subprocess.run([sys.executable, "-m", "cu2rec_tpu.cli.synth", raw,
                        "--preset", "ml20m", "--noise", "0.30",
                        "--factors", "20"], check=True)
        subprocess.run([sys.executable, "-m", "cu2rec_tpu.cli.split", raw,
                        "0.1"], check=True)
    floor = json.load(open(raw + ".meta.json"))["noise_floor"]
    return train_csv, test_csv, floor


def run_sgd(train_csr, test_csr, mu, *, iters, factors, collision, seed,
            train_eval_sample=0, test_eval_sample=0, dtype="float32"):
    from cu2rec_tpu.train.trainer import train
    from cu2rec_tpu.utils.config import Config
    from cu2rec_tpu.utils.metrics import MetricsLogger
    cfg = Config(total_iterations=iters, n_factors=factors,
                 check_error=max(iters // 10, 1), collision_policy=collision,
                 seed=seed, dtype=dtype,
                 train_eval_sample=train_eval_sample,
                 test_eval_sample=test_eval_sample)
    logger = MetricsLogger(verbose=False)
    t0 = time.perf_counter()
    _model, _losses = train(train_csr, test_csr, cfg, mu, logger=logger)
    wall = time.perf_counter() - t0
    evals = [r for r in logger.history if r["event"] == "eval"]
    last = evals[-1] if evals else {}
    # the trainer's own timer excludes warmup/compile (training.cu:18-19
    # analogue) — report both
    times = [r for r in logger.history if r["event"] == "time"]
    train_s = times[-1]["seconds"] if times else None
    return dict(test_rmse=last.get("test_rmse"),
                test_mae=last.get("test_mae"),
                train_rmse=last.get("train_rmse"), wall_s=round(wall, 2),
                train_s=round(train_s, 2) if train_s else None,
                updates_per_s=round(train_csr.n_users * iters / train_s, 1)
                if train_s else None)


def run_als(train_csr, test_csr, mu, *, sweeps, factors, reg, seed,
            train_eval_sample=0, test_eval_sample=0):
    from cu2rec_tpu.train.als import train_als
    from cu2rec_tpu.utils.config import Config
    from cu2rec_tpu.utils.metrics import MetricsLogger
    cfg = Config(total_iterations=sweeps, n_factors=factors, seed=seed,
                 P_reg=reg, Q_reg=reg, user_bias_reg=reg, item_bias_reg=reg,
                 train_eval_sample=train_eval_sample,
                 test_eval_sample=test_eval_sample)
    logger = MetricsLogger(verbose=False)
    t0 = time.perf_counter()
    _model, _losses = train_als(train_csr, test_csr, cfg, mu, logger=logger)
    wall = time.perf_counter() - t0
    evals = [r for r in logger.history if r["event"] == "eval"]
    last = evals[-1] if evals else {}
    return dict(test_rmse=last.get("test_rmse"),
                test_mae=last.get("test_mae"),
                train_rmse=last.get("train_rmse"), wall_s=round(wall, 2))


def summarize(rows):
    vals = [r["test_rmse"] for r in rows if r.get("test_rmse") is not None]
    if not vals:
        return {}
    return dict(n=len(vals), mean=round(statistics.fmean(vals), 5),
                std=round(statistics.stdev(vals), 5) if len(vals) > 1 else 0.0,
                min=round(min(vals), 5), max=round(max(vals), 5))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--seed-base", type=int, default=42)
    p.add_argument("--cells", nargs="+",
                   default=["ml100k-sgd", "ml100k-als", "ml20m-sgd"],
                   choices=["ml100k-sgd", "ml100k-als", "ml20m-sgd",
                            "ml20m-bf16", "ml100k-bpr", "ml100k-ials"])
    p.add_argument("--iters", type=int, nargs="+", default=[5000, 10000])
    p.add_argument("--factors", type=int, nargs="+", default=[50, 300])
    p.add_argument("--workdir", default="/tmp/planted_ml20m")
    p.add_argument("--results-dir", default=os.path.join(ROOT, "results"))
    args = p.parse_args()

    seeds = [args.seed_base + k for k in range(args.seeds)]
    os.makedirs(args.results_dir, exist_ok=True)
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    out_path = os.path.join(args.results_dir,
                            f"seeds-{stamp}-{git_commit()}.jsonl")

    import jax
    backend = jax.default_backend()

    def emit(rec):
        rec = dict(rec, backend=backend)
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    if any(c.startswith("ml100k") for c in args.cells):
        tr, te, mu = load_pair(os.path.join(ROOT, "data",
                                            "ml100k_ratings_train.csv"),
                               os.path.join(ROOT, "data",
                                            "ml100k_ratings_test.csv"))
        if "ml100k-sgd" in args.cells:
            for collision in ("twin", "first_wins"):
                for factors in args.factors:
                    for iters in args.iters:
                        rows = []
                        for seed in seeds:
                            r = run_sgd(tr, te, mu, iters=iters,
                                        factors=factors,
                                        collision=collision, seed=seed)
                            rec = dict(event="run", dataset="ml100k",
                                       algo="sgd", collision=collision,
                                       iterations=iters, factors=factors,
                                       seed=seed, **r)
                            emit(rec)
                            rows.append(r)
                        emit(dict(event="cell", dataset="ml100k",
                                  algo="sgd", collision=collision,
                                  iterations=iters, factors=factors,
                                  test_rmse=summarize(rows)))
        if "ml100k-als" in args.cells:
            for factors in args.factors:
                rows = []
                for seed in seeds:
                    r = run_als(tr, te, mu, sweeps=10, factors=factors,
                                reg=0.1, seed=seed)
                    rec = dict(event="run", dataset="ml100k", algo="als",
                               sweeps=10, factors=factors, reg=0.1,
                               seed=seed, **r)
                    emit(rec)
                    rows.append(r)
                emit(dict(event="cell", dataset="ml100k", algo="als",
                          sweeps=10, factors=factors, reg=0.1,
                          test_rmse=summarize(rows)))

        # Implicit-family σ (beyond the r4 verdict's flagship list): the
        # ranking metrics get the same statistical footing as RMSE.
        if "ml100k-bpr" in args.cells:
            from cu2rec_tpu.train.bpr import train_bpr
            rows = []
            for seed in seeds:
                from cu2rec_tpu.utils.config import Config
                from cu2rec_tpu.utils.metrics import MetricsLogger
                cfg = Config(total_iterations=1000, n_factors=32,
                             learning_rate=0.05, seed=seed,
                             check_error=250)
                logger = MetricsLogger(verbose=False)
                t0 = time.time()
                train_bpr(tr, te, cfg, logger=logger)
                evals = [r for r in logger.history
                         if r["event"] == "eval"]
                last = evals[-1] if evals else {}
                r = dict(auc=last.get("auc"),
                         recall_at_k=last.get("recall_at_k"),
                         ndcg_at_k=last.get("ndcg_at_k"),
                         wall_s=round(time.time() - t0, 2))
                emit(dict(event="run", dataset="ml100k", algo="bpr",
                          iterations=1000, factors=32, seed=seed, **r))
                rows.append(dict(test_rmse=r["auc"]))  # summarize AUC
            emit(dict(event="cell", dataset="ml100k", algo="bpr",
                      iterations=1000, factors=32,
                      auc=summarize(rows)))
        if "ml100k-ials" in args.cells:
            from cu2rec_tpu.train.ials import train_ials
            rows = []
            for seed in seeds:
                from cu2rec_tpu.utils.config import Config
                from cu2rec_tpu.utils.metrics import MetricsLogger
                cfg = Config(total_iterations=8, n_factors=64, seed=seed,
                             P_reg=0.1, Q_reg=0.1)
                logger = MetricsLogger(verbose=False)
                t0 = time.time()
                train_ials(tr, te, cfg, alpha=40.0, logger=logger)
                evals = [r for r in logger.history
                         if r["event"] == "eval"]
                last = evals[-1] if evals else {}
                r = dict(auc=last.get("auc"),
                         recall_at_k=last.get("recall_at_k"),
                         ndcg_at_k=last.get("ndcg_at_k"),
                         wall_s=round(time.time() - t0, 2))
                emit(dict(event="run", dataset="ml100k", algo="ials",
                          sweeps=8, factors=64, alpha=40.0, seed=seed,
                          **r))
                rows.append(dict(test_rmse=r["auc"]))
            emit(dict(event="cell", dataset="ml100k", algo="ials",
                      sweeps=8, factors=64, alpha=40.0,
                      auc=summarize(rows)))

    ml20m_cells = [c for c in args.cells if c.startswith("ml20m")]
    if ml20m_cells:
        train_csv, test_csv, floor = ensure_planted_ml20m(args.workdir)
        tr, te, mu = load_pair(train_csv, test_csv)
        for cell in ml20m_cells:
            # ml20m-bf16 (VERDICT r4 item 4): the SAME flagship cell with
            # bfloat16 factor tables, so its RMSE delta vs the f32 cell
            # can be judged against the measured per-seed sigma.  One
            # seed by default suffices once sigma is known; --seeds
            # applies if a distribution is wanted.
            dtype = "bfloat16" if cell == "ml20m-bf16" else "float32"
            rows = []
            for seed in seeds:
                r = run_sgd(tr, te, mu, iters=5000, factors=50,
                            collision="twin", seed=seed, dtype=dtype,
                            train_eval_sample=2_000_000)
                rec = dict(event="run", dataset="planted-ml20m",
                           algo="sgd", collision="twin", iterations=5000,
                           factors=50, dtype=dtype, seed=seed,
                           noise_floor=floor, **r)
                emit(rec)
                rows.append(r)
            emit(dict(event="cell", dataset="planted-ml20m", algo="sgd",
                      collision="twin", iterations=5000, factors=50,
                      dtype=dtype, noise_floor=floor,
                      test_rmse=summarize(rows)))

    print(f"results -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
