#!/usr/bin/env python
"""Fold-in quality at scale (VERDICT r4 item 5): compare the serving
path's fresh fold-in rows against the fully-trained known rows on any
dataset pair — the predict.cu:126-132 partial-fit semantics scored as a
ranking task.

Trains a catalog (ALS for explicit ratings, iALS for implicit
strengths), builds the sharded serving engine on it, then reports
recall@k / NDCG@k of held-out items for (a) the trained user rows and
(b) rows folded in from the train-split ratings alone.  The ML-100K
version of this table lives in docs/RESULTS.md §fold-in quality; this
script reproduces it at planted-ML-20M scale where the generator's
noise floor (explicit) / oracle AUC (implicit) are known.

    python experiments/foldin_quality_probe.py \
        --train /tmp/planted_ml20m/ratings_train.csv \
        --test  /tmp/planted_ml20m/ratings_test.csv \
        --algo als --sweeps 6 --reg 0.02 --factors 50 --max-users 4096

Appends one JSON line to results/foldin-quality.jsonl.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, ROOT)

from cu2rec_tpu.utils.cache import enable_compile_cache

enable_compile_cache()


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train", required=True)
    p.add_argument("--test", required=True)
    p.add_argument("--algo", default="als", choices=["als", "ials"])
    p.add_argument("--sweeps", type=int, default=6)
    p.add_argument("--reg", type=float, default=0.02)
    p.add_argument("--factors", type=int, default=50)
    p.add_argument("--alpha", type=float, default=40.0,
                   help="iALS confidence slope (also used by the "
                        "implicit fold-in)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--max-users", type=int, default=4096,
                   help="cap evaluated users (0 = all with ratings in "
                        "both splits)")
    p.add_argument("--foldin-iters", type=int, default=500,
                   help="explicit fold-in partial-fit iterations")
    p.add_argument("--foldin-lr", type=float, default=0.05)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--tag", default="")
    args = p.parse_args()

    from cu2rec_tpu.serve.engine import ShardedServingEngine
    from cu2rec_tpu.serve.recommend import foldin_ranking_eval, ranking_eval
    from cu2rec_tpu.utils.config import Config
    from cu2rec_tpu.utils.metrics import MetricsLogger

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_seeds import load_pair  # shared-id-space CSR pair loader

    train_csr, test_csr, mu = load_pair(args.train, args.test)
    quiet = MetricsLogger(verbose=False)

    t0 = time.perf_counter()
    if args.algo == "als":
        from cu2rec_tpu.train.als import train_als
        cfg_t = Config(total_iterations=args.sweeps, n_factors=args.factors,
                       P_reg=args.reg, Q_reg=args.reg,
                       user_bias_reg=args.reg, item_bias_reg=args.reg,
                       train_eval_sample=2_000_000)
        model, losses = train_als(train_csr, test_csr, cfg_t,
                                  mu, logger=quiet)
        final_quality = {"test_rmse": losses[max(losses)]}
        mode = "sgd"
    else:
        from cu2rec_tpu.train.ials import train_ials
        cfg_t = Config(total_iterations=args.sweeps, n_factors=args.factors,
                       P_reg=args.reg, Q_reg=args.reg)
        model, losses = train_ials(train_csr, test_csr, cfg_t,
                                   alpha=args.alpha, logger=quiet)
        evals = [r for r in quiet.history if r["event"] == "eval"]
        last = evals[-1] if evals else {}
        final_quality = {k: last.get(k) for k in
                         ("auc", "recall_at_k", "ndcg_at_k")}
        mode = "implicit"
    train_s = time.perf_counter() - t0

    # Trained-known-row baseline: the ceiling the fold-in chases.
    t0 = time.perf_counter()
    base = ranking_eval(model, train_csr, test_csr, k=args.k,
                        max_users=args.max_users or None)
    base_s = time.perf_counter() - t0

    engine = ShardedServingEngine(model)
    cfg_f = Config(total_iterations=args.foldin_iters,
                   learning_rate=args.foldin_lr, n_factors=args.factors,
                   is_train=False)
    t0 = time.perf_counter()
    fold = foldin_ranking_eval(engine, train_csr, test_csr, cfg=cfg_f,
                               k=args.k, batch_size=args.batch_size,
                               max_users=args.max_users or None,
                               mode=mode, alpha=args.alpha, reg=args.reg)
    fold_s = time.perf_counter() - t0

    meta_path = args.train.replace("_train", "") + ".meta.json"
    meta = (json.load(open(meta_path))
            if os.path.exists(meta_path) else {})
    rec = dict(
        date=datetime.datetime.now().strftime("%Y%m%d-%H%M%S"),
        train=args.train, algo=args.algo, factors=args.factors,
        sweeps=args.sweeps, reg=args.reg,
        alpha=(args.alpha if args.algo == "ials" else None),
        k=args.k, n_users_eval=fold["n_users"],
        foldin_iters=(args.foldin_iters if mode == "sgd" else None),
        model_quality=final_quality,
        noise_floor=meta.get("noise_floor"),
        oracle_auc=meta.get("oracle_auc"),
        trained_recall=round(base["recall"], 5),
        trained_ndcg=round(base["ndcg"], 5),
        foldin_recall=round(fold["recall"], 5),
        foldin_ndcg=round(fold["ndcg"], 5),
        foldin_vs_trained=round(fold["recall"] / base["recall"], 4)
        if base["recall"] else None,
        train_s=round(train_s, 1), baseline_eval_s=round(base_s, 1),
        foldin_eval_s=round(fold_s, 1), tag=args.tag,
    )
    out = os.path.join(ROOT, "results", "foldin-quality.jsonl")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
