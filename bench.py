#!/usr/bin/env python
"""Headline benchmark for the driver: parallel-SGD training throughput on
MovieLens-100K (the reference's checked-in sample dataset), real hardware.

Metric: **user-updates per second** — one "iteration" performs one sampled
SGD update per user (reference sgd.cu:26-37), so
updates/s = n_users × iterations / wall_time.  This is the reference's own
headline axis (its benchmark grid times `bin/mf` over iteration counts,
experiments/cu2rec.sh:8-19).

``vs_baseline``: the reference repo publishes no numbers (BASELINE.md), so
the comparison point is the reference's own CPU-baseline protocol
(`bin/mf_cpu`, mf_sequential.cu): the ratio reported here is TPU updates/s
over the sequential-CPU twin's updates/s measured in the same run — i.e.
the GPU-vs-CPU speedup axis of the original project, on our hardware.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    from cu2rec_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from cu2rec_tpu.data import build_csr, read_ratings_csv
    from cu2rec_tpu.data.csr import to_device
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.ops.sgd import Hyper
    from cu2rec_tpu.utils.config import Config

    rd = read_ratings_csv("data/ml100k_ratings.csv")
    csr = build_csr(rd)
    cfg = Config(n_factors=50)  # reference default run config (config.h)
    hp = Hyper.from_config(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    dev = to_device(csr)

    model = init_model(csr.n_users, csr.n_items, cfg.n_factors,
                       rd.global_bias, seed=cfg.seed)

    from cu2rec_tpu.ops.packed import pack, packed_run_steps, unpack
    from cu2rec_tpu.utils.timing import fetch_barrier

    pm = pack(model)
    # Warmup / compile.
    pm = packed_run_steps(pm, dev, hp, key, jnp.int32(0), 50, True,
                          "first_wins")
    fetch_barrier(pm.T_u)

    iters = 2000
    t0 = time.perf_counter()
    pm = packed_run_steps(pm, dev, hp, key, jnp.int32(50), iters, True,
                          "first_wins")
    fetch_barrier(pm.T_u)
    dt = time.perf_counter() - t0
    tpu_ups = csr.n_users * iters / dt

    # Sequential CPU twin (the mf_cpu protocol) on a slice of iterations.
    from cu2rec_tpu.train.reference import sequential_train
    cpu_cfg = Config(n_factors=50, total_iterations=3, check_error=10**9)
    t0 = time.perf_counter()
    sequential_train(csr, csr, cpu_cfg, rd.global_bias, verbose=False)
    cpu_dt = time.perf_counter() - t0
    cpu_ups = csr.n_users * cpu_cfg.total_iterations / cpu_dt

    # Serving-path throughput: full-catalog MXU scoring + top-10
    # (BASELINE.json config 5).
    from cu2rec_tpu.serve.recommend import _topk_users
    import jax.numpy as _jnp
    B = 512
    um = unpack(pm)
    rated = _jnp.zeros((B, 1), dtype=_jnp.int32)
    rmask = _jnp.zeros((B, 1), dtype=bool)
    uids = _jnp.arange(B) % csr.n_users
    s_out = _topk_users(um.P[uids], um.user_bias[uids], um.Q, um.item_bias,
                        um.global_bias, rated, rmask, 10)
    fetch_barrier(s_out[0])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        s_out = _topk_users(um.P[uids], um.user_bias[uids], um.Q,
                            um.item_bias, um.global_bias, rated, rmask, 10)
    fetch_barrier(s_out[0])
    serve_qps = B * reps / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "ml100k_sgd_user_updates_per_s",
        "value": round(tpu_ups, 1),
        "unit": "updates/s",
        "vs_baseline": round(tpu_ups / cpu_ups, 2),
        "detail": {
            "backend": jax.default_backend(),
            "n_users": csr.n_users,
            "n_items": csr.n_items,
            "nnz": csr.nnz,
            "n_factors": cfg.n_factors,
            "iterations_timed": iters,
            "wall_s": round(dt, 4),
            "cpu_sequential_updates_per_s": round(cpu_ups, 1),
            "serving_top10_users_per_s": round(serve_qps, 1),
        },
    }))


if __name__ == "__main__":
    main()
