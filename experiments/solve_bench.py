#!/usr/bin/env python
"""Measure the batched ridge solvers at ALS shapes on the real chip.

Compares, at (B systems, N=F+1):
  * XLA custom calls (jnp.linalg.cholesky + solve_triangular)
  * blocked batch-vectorized Cholesky (ops/batched_linalg — r1 winner)
  * Pallas VMEM-resident lane-batched Cholesky (ops/pallas_linalg)

Timing is K scanned repetitions inside one compiled program (dispatch
through this environment's tunnel costs ~6-8 ms/program — see
experiments/gather_roofline.py).  Writes results/solve-bench.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, ROOT)

if "--interpret" in sys.argv:
    os.environ["CU2REC_PLATFORM"] = "cpu"

from cu2rec_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.ops.batched_linalg import ridge_solve_batched
from cu2rec_tpu.ops.pallas_linalg import ridge_solve_lanes
from cu2rec_tpu.utils.timing import fetch_barrier


def xla_solve(G, rhs):
    chol = jnp.linalg.cholesky(G)
    z = jax.scipy.linalg.solve_triangular(chol, rhs[..., None], lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), z, lower=False)[..., 0]


def scan_time(step, carry, K, aux):
    @jax.jit
    def run(c, aux):
        c, _ = jax.lax.scan(lambda c, k: (step(c, k, aux), 0), c,
                            jnp.arange(K))
        return c
    fetch_barrier(run(carry, aux))
    t0 = time.perf_counter()
    fetch_barrier(run(carry, aux))
    return (time.perf_counter() - t0) / K


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--sizes", type=int, nargs="+", default=[51, 101])
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--skip-xla", action="store_true")
    args = p.parse_args()

    out_path = os.path.join(ROOT, "results", "solve-bench.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    rng = np.random.default_rng(0)
    records = []

    def emit(**kw):
        kw["backend"] = jax.default_backend()
        records.append(kw)
        print(json.dumps(kw), flush=True)

    for N in args.sizes:
        B = args.batch
        X = rng.standard_normal((B, N, 8)).astype(np.float32)
        G = np.einsum("bij,bkj->bik", X, X) + \
            np.eye(N, dtype=np.float32)[None] * 8.0
        rhs = rng.standard_normal((B, N)).astype(np.float32)
        Gd, rd = jnp.asarray(G), jnp.asarray(rhs)
        Gl = jnp.transpose(Gd, (1, 2, 0))          # (N, N, B) lane layout
        rl = jnp.transpose(rd, (1, 0))
        flops = B * (N ** 3 / 3 + 2 * N ** 2) * 2

        # correctness cross-check (one call, small slice)
        ref = np.asarray(ridge_solve_batched(Gd[:64], rd[:64]))
        got = np.asarray(ridge_solve_lanes(
            Gl[:, :, :64], rl[:, :64], interpret=args.interpret)).T
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"N={N} pallas vs blocked rel err {rel:.2e}", flush=True)
        assert rel < 5e-3, rel

        variants = [
            ("blocked", lambda c, k, aux: ridge_solve_batched(
                aux[0] + c[0, 0] * 0, aux[1]), (Gd, rd)),
            ("pallas", lambda c, k, aux: jnp.transpose(ridge_solve_lanes(
                aux[0] + c[0, 0] * 0, aux[1],
                interpret=args.interpret), (1, 0)), (Gl, rl)),
        ]
        if not args.skip_xla:
            variants.insert(0, ("xla_custom_call",
                                lambda c, k, aux: xla_solve(
                                    aux[0] + c[0, 0] * 0, aux[1]),
                                (Gd, rd)))
        for name, step, aux in variants:
            dt = scan_time(step, jnp.zeros((B, N), jnp.float32),
                           args.k, aux)
            emit(kind="ridge_solve", variant=name, batch=B, n=N,
                 ms=dt * 1e3, gflop_s=flops / dt / 1e9,
                 systems_per_s=B / dt)

    with open(out_path, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
