#!/usr/bin/env python
"""Step-time probe at configurable scale: times the jitted SGD scan and
reports achieved HBM traffic vs the hardware roofline, to direct kernel
work (SURVEY §7 M2).

Synthetic data with a power-law item popularity, ML-20M-like by default
(U=138k, I=27k, 20M ratings, F=100).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=138_000)
    p.add_argument("--items", type=int, default=27_000)
    p.add_argument("--ratings", type=int, default=20_000_000)
    p.add_argument("--factors", type=int, default=100)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--collision", default="first_wins")
    p.add_argument("--eval", action="store_true", help="also time eval")
    p.add_argument("--packed", action="store_true")
    args = p.parse_args()

    from cu2rec_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from cu2rec_tpu.data.csr import csr_from_arrays, to_device
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.ops.sgd import Hyper
    from cu2rec_tpu.train.trainer import run_steps
    from cu2rec_tpu.utils.config import Config

    rng = np.random.default_rng(0)
    U, I, R, F = args.users, args.items, args.ratings, args.factors
    users = rng.integers(0, U, R).astype(np.int32)
    # power-law item popularity
    items = (I * rng.power(0.3, R)).astype(np.int32) % I
    vals = rng.uniform(0.5, 5.0, R).astype(np.float32)
    t0 = time.perf_counter()
    csr = csr_from_arrays(users, items, vals, U, I)
    print(f"host CSR build: {time.perf_counter() - t0:.2f}s")

    cfg = Config(n_factors=F, dtype=args.dtype,
                 collision_policy=args.collision)
    dev = to_device(csr, item_major=(args.collision == "twin"))
    model = init_model(U, I, F, 3.5, dtype=jnp.dtype(args.dtype))
    hp = Hyper.from_config(cfg)
    key = jax.random.PRNGKey(0)

    runner = run_steps
    if args.packed:
        from cu2rec_tpu.ops.packed import pack, packed_run_steps, unpack
        pm = pack(model)

        def runner(model, dev, hp, key, start, n, train_items, collision,
                   _box=[pm]):
            _box[0] = packed_run_steps(_box[0], dev, hp, key, start, n,
                                       train_items, collision)
            return unpack(_box[0])

    from cu2rec_tpu.utils.timing import fetch_barrier

    # compile
    t0 = time.perf_counter()
    model = runner(model, dev, hp, key, jnp.int32(0), 10, True,
                   args.collision)
    fetch_barrier(model.P)
    print(f"compile+10 steps: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    model = runner(model, dev, hp, key, jnp.int32(10), args.iters, True,
                   args.collision)
    fetch_barrier(model.P)
    dt = time.perf_counter() - t0
    per_step = dt / args.iters

    bpe = jnp.dtype(args.dtype).itemsize
    # Minimal traffic per step: P read+write (2UF), q gather read (UF),
    # q scatter read+write (2UF at the table; first-wins touches ≤U rows),
    # biases (~4U), sampling CSR touches (~3U incl indices/data/indptr).
    min_bytes = (5 * U * F + 7 * U) * bpe
    print(f"per-step: {per_step * 1e3:.3f} ms  "
          f"({U / per_step / 1e6:.1f}M updates/s)")
    print(f"minimal HBM traffic/step ≈ {min_bytes / 1e6:.1f} MB → "
          f"achieved {min_bytes / per_step / 1e9:.0f} GB/s "
          f"(v5e HBM ≈ 819 GB/s)")

    if args.eval:
        from cu2rec_tpu.ops.loss import evaluate
        evaluate(model, dev)  # compile
        t0 = time.perf_counter()
        rmse, mae = evaluate(model, dev)
        dt = time.perf_counter() - t0
        print(f"eval: {dt * 1e3:.1f} ms for {R} ratings "
              f"({R / dt / 1e9:.2f}G ratings/s) rmse={rmse:.4f}")


if __name__ == "__main__":
    main()
