#!/usr/bin/env python
"""End-to-end ALS half-sweep timing at ML-20M-like scale, per solver.

Times full user+item half-sweeps (Gram build + ridge solves + table
writes, the real ALS hot loop from train/als.py) on synthetic power-law
data, for each batched ridge solver backend.  Appends to
results/als-sweep.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, ROOT)

from cu2rec_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.data.csr import csr_from_arrays, transpose_csr
from cu2rec_tpu.models.state import init_model
from cu2rec_tpu.ops.als import als_half_sweep, prepare_chunks_device
from cu2rec_tpu.ops.packed import pack
from cu2rec_tpu.utils.timing import fetch_barrier


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=138_000)
    p.add_argument("--items", type=int, default=27_000)
    p.add_argument("--ratings", type=int, default=20_000_000)
    p.add_argument("--factors", type=int, default=100)
    p.add_argument("--sweeps", type=int, default=3)
    p.add_argument("--solvers", nargs="+", default=["blocked", "pallas"])
    p.add_argument("--fused", type=int, default=1,
                   help="1 = one jitted program per half-sweep, "
                        "0 = one dispatch per chunk")
    p.add_argument("--algo", choices=["als", "ials"], default="als",
                   help="ials times the implicit weighted sweeps "
                        "(ops/ials.py) on the same bucketed data")
    p.add_argument("--alpha", type=float, default=40.0,
                   help="iALS confidence weight")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    U, I, R, F = args.users, args.items, args.ratings, args.factors
    users = rng.integers(0, U, R).astype(np.int32)
    pop = (1.0 / np.arange(1, I + 1)) ** 0.8
    items = rng.choice(I, size=R, p=pop / pop.sum()).astype(np.int32)
    vals = rng.uniform(0.5, 5.0, R).astype(np.float32)
    csr = csr_from_arrays(users, items, vals, U, I)
    mu = float(vals.mean())

    model = init_model(U, I, F, mu, seed=42)
    pm = pack(model)
    it_indptr, it_rows, it_vals = transpose_csr(csr)
    user_buckets = prepare_chunks_device(
        jnp.asarray(csr.indices), jnp.asarray(csr.data), csr.indptr,
        F, U, csr.nnz)
    item_buckets = prepare_chunks_device(
        jnp.asarray(it_rows), jnp.asarray(it_vals), it_indptr, F, I,
        csr.nnz)

    out_path = os.path.join(ROOT, "results", "als-sweep.jsonl")
    records = []
    if args.algo == "ials":
        from cu2rec_tpu.ops.ials import ials_half_sweep
    for solver in args.solvers:
        if args.algo == "ials":
            def sweep(X_u, Y_i, _a=float(args.alpha)):
                X_u = ials_half_sweep(X_u, Y_i, user_buckets, _a, 0.02,
                                      solver=solver,
                                      fused=bool(args.fused))
                Y_i = ials_half_sweep(Y_i, X_u, item_buckets, _a, 0.02,
                                      solver=solver,
                                      fused=bool(args.fused))
                return X_u, Y_i
        else:
            def sweep(T_u, T_i):
                T_u = als_half_sweep(T_u, T_i, user_buckets, mu, 0.02,
                                     0.02, F, solver=solver,
                                     fused=bool(args.fused))
                T_i = als_half_sweep(T_i, T_u, item_buckets, mu, 0.02,
                                     0.02, F, solver=solver,
                                     fused=bool(args.fused))
                return T_u, T_i

        if args.algo == "ials":
            # iALS sweeps take plain (N, F) factor tables (train/ials.py).
            T_u = jnp.asarray(model.P, jnp.float32)
            T_i = jnp.asarray(model.Q, jnp.float32)
        else:
            T_u, T_i = pm.T_u, pm.T_i
        T_u, T_i = sweep(T_u, T_i)          # warmup / compile
        # Both tables: the item half-sweep is its own program and would
        # otherwise straddle the timing boundary.
        fetch_barrier((T_u, T_i))
        t0 = time.perf_counter()
        for _ in range(args.sweeps):
            T_u, T_i = sweep(T_u, T_i)
        fetch_barrier((T_u, T_i))
        dt = (time.perf_counter() - t0) / args.sweeps
        rec = {"kind": "als_sweep", "algo": args.algo, "solver": solver,
               "users": U, "items": I, "ratings": R, "factors": F,
               "fused": bool(args.fused),
               "s_per_sweep": dt, "rows_per_s": (U + I) / dt,
               "backend": jax.default_backend()}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
