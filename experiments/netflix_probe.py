#!/usr/bin/env python
"""Netflix-scale capacity probe (BASELINE.json config 3): synthetic 100M
ratings, 480K users × 17,770 items, F=50 — verifies single-chip HBM fit,
ingest/CSR time, step time, and eval time at the reference's largest
dataset scale."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=480_189)
    p.add_argument("--items", type=int, default=17_770)
    p.add_argument("--ratings", type=int, default=100_480_507)
    p.add_argument("--factors", type=int, default=50)
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--collision", default="first_wins",
                   choices=["first_wins", "mean", "sum", "twin"])
    p.add_argument("--lean", action="store_true",
                   help="mirror-free sampling layout (16 B/rating instead "
                        "of 28 under twin; data/csr.to_device lean=True) — "
                        "the layout that fits F=300 at this scale")
    args = p.parse_args()

    from cu2rec_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from cu2rec_tpu.data.csr import csr_from_arrays, to_device
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.ops.loss import evaluate_packed
    from cu2rec_tpu.ops.packed import pack, packed_run_steps
    from cu2rec_tpu.ops.sgd import Hyper
    from cu2rec_tpu.utils.config import Config
    from cu2rec_tpu.utils.timing import fetch_barrier

    U, I, R, F = args.users, args.items, args.ratings, args.factors
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    users = rng.integers(0, U, R).astype(np.int32)
    items = (I * rng.power(0.25, R)).astype(np.int32) % I
    vals = (rng.integers(1, 6, R)).astype(np.float32)
    print(f"synth gen: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    csr = csr_from_arrays(users, items, vals, U, I)
    print(f"CSR build (native): {time.perf_counter() - t0:.1f}s")
    del users, items, vals

    t0 = time.perf_counter()
    dev = to_device(csr, item_major=args.collision == "twin",
                    lean=args.lean)
    fetch_barrier(dev.data)
    print(f"H2D upload: {time.perf_counter() - t0:.1f}s "
          f"(~{(csr.nnz * 12) / 1e9:.1f} GB)")

    cfg = Config(n_factors=F, dtype=args.dtype)
    pm = pack(init_model(U, I, F, 3.6, dtype=jnp.dtype(args.dtype)))
    hp = Hyper.from_config(cfg)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    pm = packed_run_steps(pm, dev, hp, key, jnp.int32(0), 10, True,
                          args.collision)
    fetch_barrier(pm.T_u)
    print(f"compile+10 steps: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    pm = packed_run_steps(pm, dev, hp, key, jnp.int32(10), args.iters, True,
                          args.collision)
    fetch_barrier(pm.T_u)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"per-step: {dt * 1e3:.3f} ms ({U / dt / 1e6:.1f}M updates/s; "
          f"one epoch-equivalent = {csr.nnz / U:.0f} iters = "
          f"{csr.nnz / U * dt:.1f}s)")

    t0 = time.perf_counter()
    rmse, mae = evaluate_packed(pm, dev)
    print(f"eval (compile+run): {time.perf_counter() - t0:.1f}s "
          f"rmse={rmse:.4f}")
    t0 = time.perf_counter()
    rmse, mae = evaluate_packed(pm, dev)
    print(f"eval hot: {time.perf_counter() - t0:.1f}s")

    dev_stats = jax.devices()[0].memory_stats() or {}
    print("device memory in use:",
          round(dev_stats.get("bytes_in_use", 0) / 1e9, 2), "GB")


if __name__ == "__main__":
    main()
