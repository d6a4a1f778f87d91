#!/usr/bin/env python
"""Empirical HBM roofline for the SGD step's access pattern.

The twin step (ops/packed.py) is dominated by random ROW gathers from the
packed tables — an access pattern whose ceiling is HBM *transactions*, not
streamed bytes.  This probe measures, on the real chip:

  1. random-row-gather rate vs row width (XLA gather) — if rows/s is flat
     in width for sub-512B rows, the step is transaction-bound and the
     relevant roofline is the measured max rows/s, NOT the ~800 GB/s
     streaming number;
  2. the streaming ceiling (dense two-pass) for contrast;
  3. a Pallas one-DMA-per-row gather with a ring of outstanding copies —
     the ROADMAP.md candidate for beating XLA's gather.  Its ceiling is
     the scalar DMA-descriptor issue rate; if that is below XLA's gather
     rate, the idea is retired with this measurement.

Writes one JSON line per measurement to results/gather-roofline.jsonl and
prints a step-roofline summary (predicted floor for the twin step from
measured rates vs. the measured 1.8 ms).

Run on TPU (default platform); `--interpret` runs the Pallas kernel in
interpreter mode for correctness on CPU.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, ROOT)

# Must happen before the first jax import: the axon TPU plugin overrides
# jax.config platform updates, so --interpret forces CPU via the package's
# CU2REC_PLATFORM hook (cu2rec_tpu/__init__.py).
if "--interpret" in sys.argv:
    os.environ["CU2REC_PLATFORM"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cu2rec_tpu.utils.timing import fetch_barrier

NSEM = 16  # outstanding DMA ring


def _pallas_row_gather(table, idx, interpret=False):
    """out[m] = table[idx[m]] via one async HBM→VMEM DMA per row, NSEM
    outstanding.  Measures the per-descriptor issue cost."""
    M = idx.shape[0]
    W = table.shape[1]

    def kernel(idx_ref, table_ref, out_ref, sems):
        def dma(i):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[i]], out_ref.at[i], sems.at[i % NSEM])

        def body(i, _):
            @pl.when(i >= NSEM)
            def _():
                dma(i - NSEM).wait()
            dma(i).start()
            return 0

        jax.lax.fori_loop(0, M, body, 0)

        def drain(j, _):
            i = jnp.maximum(M - NSEM, 0) + j

            @pl.when(i < M)
            def _():
                dma(i).wait()
            return 0

        jax.lax.fori_loop(0, jnp.minimum(NSEM, M), drain, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, W), table.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(M * W * 4 + (1 << 20))),
    )(idx, table)


def _scan_time(step, carry, K, aux=None):
    """Time K repetitions of ``carry = step(carry, k)`` inside ONE
    compiled program (lax.scan → sequential while loop) and return
    seconds per repetition.

    Through this environment's tunneled runtime each dispatched program
    costs ~6-8 ms of launch latency — more than any op measured here —
    so per-call timing measures the tunnel, not HBM (the first run of
    this probe produced an '84 GB/s stream / 31 ms step floor' that the
    measured 1.8 ms twin step immediately falsifies).  Scanning K
    data-distinct iterations in-program amortizes the dispatch to
    noise.

    ``aux`` (e.g. the gathered-from table) is passed as a jit OPERAND —
    closing over a large concrete array bakes it into the HLO as a
    constant, and the tunnel's remote-compile endpoint rejects bodies
    over ~200 MB (HTTP 413 at the 256 MB W=512 table)."""
    @jax.jit
    def run(c, aux):
        c, _ = jax.lax.scan(lambda c, k: (step(c, k, aux), 0), c,
                            jnp.arange(K))
        return c
    fetch_barrier(run(carry, aux))  # compile + dispatch warmup
    t0 = time.perf_counter()
    fetch_barrier(run(carry, aux))
    return (time.perf_counter() - t0) / K


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=131072)  # table rows
    p.add_argument("--draws", type=int, default=131072)  # gathered rows
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--pallas-draws", type=int, default=16384)
    args = p.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    out_path = os.path.join(ROOT, "results", "gather-roofline.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    records = []

    def emit(**kw):
        kw["backend"] = jax.default_backend()
        records.append(kw)
        print(json.dumps(kw), flush=True)

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, args.rows, size=args.draws,
                                   dtype=np.int32))

    # 1. XLA random row gather vs width (K rotated index sets per program)
    K = 64
    for W in (32, 64, 128, 256, 512):
        table = jnp.asarray(rng.standard_normal((args.rows, W)),
                            jnp.float32)

        def gstep(acc, k, t):
            return acc + jnp.sum(t[(idx + k) % args.rows], axis=0)

        dt = _scan_time(gstep, jnp.zeros((W,), jnp.float32), K, table)
        emit(kind="xla_gather", width=W, rows_per_s=args.draws / dt,
             useful_gb_s=args.draws * W * 4 / dt / 1e9, ms=dt * 1e3)

    # 2. streaming ceiling: dense read+write of the widest table
    table = jnp.asarray(rng.standard_normal((args.rows, 512)), jnp.float32)
    dt = _scan_time(lambda t, k, _: t * 1.0001 + 0.5, table, K)
    emit(kind="stream", bytes=2 * table.size * 4,
         gb_s=2 * table.size * 4 / dt / 1e9, ms=dt * 1e3)

    # 3. Pallas DMA-per-row gather (correctness + rate)
    W = 128
    table = jnp.asarray(rng.standard_normal((args.rows, W)), jnp.float32)
    pidx = idx[:args.pallas_draws]
    f = jax.jit(functools.partial(_pallas_row_gather,
                                  interpret=args.interpret))
    out = f(table, pidx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[pidx],
                               rtol=0, atol=0)
    print("pallas gather: exact", flush=True)
    if not args.interpret:
        def pstep(acc, k, t):
            return acc + jnp.sum(
                f(t, (pidx + k) % args.rows), axis=0)

        dt = _scan_time(pstep, jnp.zeros((W,), jnp.float32), 16, table)
        emit(kind="pallas_dma_gather", width=W, n_sem=NSEM,
             rows_per_s=args.pallas_draws / dt,
             useful_gb_s=args.pallas_draws * W * 4 / dt / 1e9, ms=dt * 1e3)

        # Step-roofline bounds at ML-20M shapes from the measured rates.
        # The twin step is NOT all no-reuse random gathers: the user pass
        # is dense (streams T_u in order), and the U sampled-item draws
        # hit a table of only I=27K rows (13.8 MB) — heavy reuse.  Only
        # the I sampled-user draws are genuinely random over a large
        # table.  So the floor is a RANGE: optimistic counts the
        # reuse-heavy draws as one streaming pass of the item table;
        # pessimistic charges every draw a full random transaction.
        xla128 = [r for r in records
                  if r["kind"] == "xla_gather" and r["width"] == 128]
        stream = [r for r in records if r["kind"] == "stream"]
        if xla128 and stream:
            U, I, Wp = 138_000, 27_000, 128
            g = xla128[0]["rows_per_s"]
            s = stream[0]["gb_s"] * 1e9
            row_b = Wp * 4
            t_tables = 2 * (U + I) * row_b * 2 / s   # r+w both packed tables
            t_rand = I / g                           # item side: I draws of U-table
            t_reuse_lo = I * row_b / s               # U draws of I-table, stream bound
            t_reuse_hi = U / g                       # ... every draw a transaction
            emit(kind="twin_step_floor_ml20m",
                 stream_ms=t_tables * 1e3, rand_gather_ms=t_rand * 1e3,
                 floor_lo_ms=(t_tables + t_rand + t_reuse_lo) * 1e3,
                 floor_hi_ms=(t_tables + t_rand + t_reuse_hi) * 1e3,
                 measured_step_ms=1.82)

    with open(out_path, "a") as f_:
        for r in records:
            f_.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
