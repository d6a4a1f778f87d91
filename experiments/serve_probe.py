#!/usr/bin/env python
"""Serving-path probe: recommend QPS + batched fold-in latency on a
synthetic catalog (default 1M items — beyond any MovieLens/Netflix
catalog; BASELINE.json config 5 'full-catalog recall@10 QPS').

Runs through the ShardedServingEngine (serve/engine.py): item-sharded
packed catalog, MXU scoring, local top-k + all_gather merge, batched
fold-in.  On the single real chip the mesh is ip=1; on the CPU test mesh
pass CU2REC_PLATFORM=cpu:8 to exercise ip=8 sharding.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--items", type=int, default=1_000_000)
    p.add_argument("--factors", type=int, default=64)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--n-batches", type=int, default=20)
    p.add_argument("--foldin-iters", type=int, default=100)
    args = p.parse_args()

    from cu2rec_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import numpy as np

    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.serve.engine import ShardedServingEngine
    from cu2rec_tpu.utils.config import Config
    from cu2rec_tpu.utils.timing import fetch_barrier

    I, F, B = args.items, args.factors, args.batch
    model = init_model(8, I, F, 3.5, seed=0)
    t0 = time.perf_counter()
    eng = ShardedServingEngine(model)
    print(f"engine up: {I} items x W={eng.W} over ip={eng.n_ip} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    qps = eng.bench_qps(batch_size=B, k=args.k, n_batches=args.n_batches)

    # Batched fold-in latency: B new users with 32 ratings each.
    rng = np.random.default_rng(0)
    rated = rng.integers(0, I, (B, 32)).astype(np.int32)
    vals = rng.uniform(1, 5, (B, 32)).astype(np.float32)
    mask = np.ones((B, 32), bool)
    cfg = Config(total_iterations=args.foldin_iters, learning_rate=0.05,
                 n_factors=F)
    p_rows, ub = eng.fold_in(rated, vals, mask, cfg)   # compile
    fetch_barrier(p_rows)
    t0 = time.perf_counter()
    p_rows, ub = eng.fold_in(rated, vals, mask, cfg)
    fetch_barrier(p_rows)
    fold_dt = time.perf_counter() - t0

    out = dict(n_items=I, n_factors=F, ip=eng.n_ip, batch=B, k=args.k,
               recommend_users_per_s=round(qps, 1),
               foldin_batch_s=round(fold_dt, 4),
               foldin_users_per_s=round(B / fold_dt, 1),
               foldin_iterations=args.foldin_iters,
               backend=jax.default_backend())
    print(json.dumps(out))
    res = os.path.join(os.path.dirname(__file__), os.pardir, "results",
                       "serve-probe.jsonl")
    with open(res, "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
