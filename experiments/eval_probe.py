#!/usr/bin/env python
"""Is RMSE/MAE eval at its floor?  (It is >half of default-protocol wall
time at ML-20M: eval 1.1 s/point vs 0.91 s per 500 steps.)

The eval path (ops/loss.py:_eval_packed_jit) gathers one user row PER
RATING from the 70 MB packed user table at the measured large-table rate
(82 M rows/s → 0.24 s for 20M ratings), even though ``row_ids`` is
ascending (CSR expansion).  results/vmem-gather.jsonl showed gathers from
tables ≤16 MB run 3× faster (246 M rows/s — XLA serves VMEM-fitting
tables at VMEM speed).  This probe measures a **windowed** eval: each scan
chunk dynamic-slices a VMEM-sized window of the user table (the chunk's
rows span a narrow ascending user range) and gathers locally from the
window.  Item rows already hit the fast path (the item table is 13.8 MB).

Variants measured at ML-20M scale, exactness-checked against each other:
  * eval_plain        — the shipped _eval_packed_jit
  * eval_no_user      — user term removed (attributes the user-gather cost)
  * eval_windowed     — dynamic-slice window + local gather

One JSON line per measurement → results/eval-probe.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, ROOT)

if "--cpu" in sys.argv:
    os.environ["CU2REC_PLATFORM"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.data.csr import csr_from_arrays, to_device
from cu2rec_tpu.data.synth import generate_planted
from cu2rec_tpu.models.state import init_model
from cu2rec_tpu.ops.loss import _eval_packed_jit
from cu2rec_tpu.ops.packed import pack
from cu2rec_tpu.utils.cache import enable_compile_cache
from cu2rec_tpu.utils.timing import fetch_barrier

enable_compile_cache()


def _chunks(dev, chunk_size):
    n = dev.indices.shape[0]
    mask = jnp.arange(n, dtype=jnp.int32) < jnp.int32(dev.nnz)
    n_chunks = max(-(-n // chunk_size), 1)
    padded = n_chunks * chunk_size

    def pad(x, fill=0):
        return jnp.pad(x, (0, padded - n), constant_values=fill)

    return (pad(dev.row_ids).reshape(n_chunks, -1),
            pad(dev.indices).reshape(n_chunks, -1),
            pad(dev.data).reshape(n_chunks, -1),
            pad(mask, False).reshape(n_chunks, -1))


def eval_windowed(pm, dev, span: int, chunk_size: int):
    F, W = pm.n_factors, pm.width
    U = pm.T_u.shape[0]
    col = jnp.arange(W)
    factor = (col < F).astype(jnp.float32)
    biascol = (col == F).astype(jnp.float32)
    rows_c, cols_c, vals_c, mask_c = _chunks(dev, chunk_size)

    def body(carry, chunk):
        sse, sae = carry
        r, c, v, m = chunk
        u0 = jnp.minimum(r[0], U - span)
        win = jax.lax.dynamic_slice(pm.T_u, (u0, jnp.int32(0)), (span, W))
        ru = win[jnp.clip(r - u0, 0, span - 1)].astype(jnp.float32)
        ri = pm.T_i[c].astype(jnp.float32)
        ihat = ri * factor + biascol
        pred = pm.global_bias + jnp.sum(ru * ihat, axis=-1) + ri[:, F]
        err = jnp.where(m, v - pred, 0.0)
        return (sse + jnp.sum(err * err), sae + jnp.sum(jnp.abs(err))), None

    (sse, sae), _ = jax.lax.scan(
        body, (jnp.float32(0), jnp.float32(0)),
        (rows_c, cols_c, vals_c, mask_c))
    denom = jnp.float32(dev.nnz)
    return jnp.sqrt(sse / denom), sae / denom


def eval_no_user(pm, dev, chunk_size: int):
    """User term replaced by row 0 — attributes the user-gather cost."""
    F, W = pm.n_factors, pm.width
    col = jnp.arange(W)
    factor = (col < F).astype(jnp.float32)
    biascol = (col == F).astype(jnp.float32)
    rows_c, cols_c, vals_c, mask_c = _chunks(dev, chunk_size)
    r0 = pm.T_u[0].astype(jnp.float32)

    def body(carry, chunk):
        sse, sae = carry
        _, c, v, m = chunk
        ri = pm.T_i[c].astype(jnp.float32)
        ihat = ri * factor + biascol
        pred = pm.global_bias + jnp.sum(r0 * ihat, axis=-1) + ri[:, F]
        err = jnp.where(m, v - pred, 0.0)
        return (sse + jnp.sum(err * err), sae + jnp.sum(jnp.abs(err))), None

    (sse, sae), _ = jax.lax.scan(
        body, (jnp.float32(0), jnp.float32(0)),
        (rows_c, cols_c, vals_c, mask_c))
    denom = jnp.float32(dev.nnz)
    return jnp.sqrt(sse / denom), sae / denom


def max_span(indptr: np.ndarray, nnz: int, chunk_size: int) -> int:
    """Max user-range width any chunk of ``chunk_size`` ratings touches."""
    starts = np.arange(0, nnz, chunk_size)
    ends = np.minimum(starts + chunk_size, nnz) - 1
    lo = np.searchsorted(indptr, starts, side="right") - 1
    hi = np.searchsorted(indptr, ends, side="right") - 1
    return int((hi - lo).max() + 1)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--users", type=int, default=138_000)
    p.add_argument("--items", type=int, default=27_000)
    p.add_argument("--ratings", type=int, default=20_000_000)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    if args.cpu:
        args.users, args.items, args.ratings = 6_000, 2_000, 400_000

    out_path = os.path.join(ROOT, "results", "eval-probe.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    records = []

    def emit(**kw):
        kw["backend"] = jax.default_backend()
        records.append(kw)
        print(json.dumps(kw), flush=True)

    U, I, R, F = args.users, args.items, args.ratings, 100
    d = generate_planted(U, I, R, n_factors=20, noise=0.30, seed=0)
    csr = csr_from_arrays(d.users, d.items, d.ratings, U, I)
    dev = to_device(csr)
    pm = pack(init_model(U, I, F, 3.6, seed=42))

    def timed(fn, *a, **kw):
        rmse, mae = fn(*a, **kw)
        fetch_barrier(rmse)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            rmse, mae = fn(*a, **kw)
            fetch_barrier(rmse)
        return (time.perf_counter() - t0) / args.reps, float(rmse), float(mae)

    import dataclasses

    C = 1 << 20
    dev_plain = dataclasses.replace(dev, eval_span=0)
    dt, rmse0, mae0 = timed(_eval_packed_jit, pm, dev_plain, C)
    emit(kind="eval_plain", nnz=R, chunk=C, s=round(dt, 4), rmse=rmse0)

    # the shipped auto-windowed path (ops/loss.py picks the window from
    # dev.eval_span computed at to_device time)
    dt, rmse_s, _ = timed(_eval_packed_jit, pm, dev, C)
    emit(kind="eval_shipped", nnz=R, span=dev.eval_span, s=round(dt, 4),
         rmse=rmse_s,
         exact_vs_plain=bool(np.isclose(rmse_s, rmse0, rtol=0, atol=1e-6)))

    nu = jax.jit(eval_no_user, static_argnames=("chunk_size",))
    dt, _, _ = timed(nu, pm, dev, chunk_size=C)
    emit(kind="eval_no_user", nnz=R, chunk=C, s=round(dt, 4))

    indptr = np.asarray(csr.indptr)
    wj = jax.jit(eval_windowed, static_argnames=("span", "chunk_size"))
    for C2 in (1 << 20, 1 << 18):
        span = -(-max_span(indptr, csr.nnz, C2) // 8) * 8
        span = min(span, pm.T_u.shape[0])
        dt, rmse, mae = timed(wj, pm, dev, span=span, chunk_size=C2)
        exact = bool(np.isclose(rmse, rmse0, rtol=0, atol=1e-6)
                     and np.isclose(mae, mae0, rtol=0, atol=1e-6))
        emit(kind="eval_windowed", nnz=R, chunk=C2, span=span,
             s=round(dt, 4), rmse=rmse, exact_vs_plain=exact)

    with open(out_path, "a") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
