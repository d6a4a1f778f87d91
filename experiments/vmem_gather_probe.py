#!/usr/bin/env python
"""Can a VMEM-resident table beat XLA's random row gather?

The measured machine ceilings (results/gather-roofline.jsonl) are
82 M rows/s for XLA's random row gather at W=128 and 7.3 M rows/s for a
Pallas one-HBM-DMA-per-row gather (retired).  Both pay HBM transaction
cost per row.  But the tables the SGD step and the ALS Gram build
actually gather from are SMALL: the packed ITEM table is I×W×4B =
13.8 MB at ML-20M (I=27K) and 9.1 MB at Netflix (I=17.8K) — they fit in
VMEM.  This probe measures a Pallas kernel that

  * keeps the whole table VMEM-resident across the grid (constant block
    index map → fetched from HBM once),
  * streams index blocks through SMEM,
  * copies rows VMEM→VMEM with per-row dynamic slices (no DMA per row —
    the thing that killed the previous Pallas gather).

Also measures XLA's gather with SORTED indices (does XLA exploit
locality? relevant because ALS chunk cols are per-row ascending) and
re-baselines the XLA random gather in the same run.

One JSON line per measurement → results/vmem-gather.jsonl.
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

if "--interpret" in sys.argv:
    os.environ["CU2REC_PLATFORM"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cu2rec_tpu.utils.cache import enable_compile_cache
from cu2rec_tpu.utils.timing import fetch_barrier

enable_compile_cache()


def vmem_gather(table, idx, block: int = 2048, unroll: int = 8,
                interpret: bool = False):
    """out[m] = table[idx[m]] with the table VMEM-resident.

    ``table`` (I, W) must fit in VMEM next to one out block; rows and W
    should be multiples of the f32 tile (8, 128).  ``idx`` length must
    be a multiple of ``block`` (caller pads).
    """
    I, W = table.shape
    M = idx.shape[0]
    assert M % block == 0, (M, block)

    assert block % unroll == 0, (block, unroll)

    def kernel(idx_ref, table_ref, out_ref):
        # Mosaic's fori_loop only supports full/no unroll — unroll by
        # hand: each iteration copies ``unroll`` rows.
        def body(j, _):
            base = j * unroll
            for u in range(unroll):
                r = idx_ref[base + u]
                out_ref[pl.ds(base + u, 1), :] = table_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, block // unroll, body, 0)

    return pl.pallas_call(
        kernel,
        grid=(M // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((I, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, W), table.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(table.size * 4 + 8 * block * W * 4
                                 + (4 << 20))),
    )(idx, table)


def _scan_time(step, carry, K, aux=None):
    """Seconds per rep of ``carry = step(carry, k, aux)`` inside one
    compiled scan (amortizes the ~6-8 ms tunnel dispatch latency)."""
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
    p.add_argument("--draws", type=int, default=1 << 20)
    p.add_argument("--interpret", action="store_true")
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--size-sweep", action="store_true",
                   help="measure XLA gather rate vs table rows @W=128 "
                        "(no Pallas) — the rate is table-size dependent")
    args = p.parse_args()

    out_path = os.path.join(ROOT, "results", "vmem-gather.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    records = []

    def emit(**kw):
        kw["backend"] = jax.default_backend()
        records.append(kw)
        print(json.dumps(kw), flush=True)

    rng = np.random.default_rng(0)
    W = 128
    M = args.draws
    K = args.reps

    if args.size_sweep:
        # The gather-roofline probe's 82 M rows/s was measured on a
        # 131K-row (67 MB) table; real catalogs are 14-27 MB and gather
        # 3x faster.  Map the rate across the whole size range so step /
        # sweep floors can be charged the rate their tables actually see.
        for I in (8_192, 16_384, 32_768, 65_536, 131_072, 262_144,
                  524_288, 1_048_576):
            table = jnp.asarray(
                rng.standard_normal((I, W)).astype(np.float32))
            idx = jnp.asarray(rng.integers(0, I, size=M, dtype=np.int32))

            def xstep(acc, k, t):
                return acc + jnp.sum(t[(idx + k) % I], axis=0)

            dt = _scan_time(xstep, jnp.zeros((W,), jnp.float32), K, table)
            emit(kind="xla_gather_vs_rows", rows=I, width=W, draws=M,
                 table_mb=I * W * 4 / 2**20, rows_per_s=M / dt,
                 ms=dt * 1e3)
        with open(out_path, "a") as fh:
            for r in records:
                fh.write(json.dumps(r) + "\n")
        return 0

    for I in (17_792, 27_008):          # Netflix-, ML-20M-sized catalogs
        table = jnp.asarray(rng.standard_normal((I, W)), jnp.float32)
        idx_np = rng.integers(0, I, size=M, dtype=np.int32)
        idx = jnp.asarray(idx_np)

        # correctness first (tiny)
        small = idx[:4096]
        f = functools.partial(vmem_gather, interpret=args.interpret)
        out = f(table, small)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table)[idx_np[:4096]])
        print(f"I={I}: vmem_gather exact", flush=True)
        if args.interpret:
            continue

        # XLA baselines, same shapes, same run
        def xstep(acc, k, t):
            return acc + jnp.sum(t[(idx + k) % I], axis=0)

        dt = _scan_time(xstep, jnp.zeros((W,), jnp.float32), K, table)
        emit(kind="xla_gather_random", rows=I, draws=M,
             rows_per_s=M / dt, ms=dt * 1e3)

        sidx = jnp.asarray(np.sort(idx_np))

        def sstep(acc, k, t):
            return acc + jnp.sum(t[jnp.minimum(sidx + k, I - 1)], axis=0)

        dt = _scan_time(sstep, jnp.zeros((W,), jnp.float32), K, table)
        emit(kind="xla_gather_sorted", rows=I, draws=M,
             rows_per_s=M / dt, ms=dt * 1e3)

        for block, unroll in ((2048, 8), (4096, 16)):
            g = functools.partial(vmem_gather, block=block, unroll=unroll)

            def pstep(acc, k, t):
                return acc + jnp.sum(g(t, (idx + k) % I), axis=0)

            try:
                dt = _scan_time(pstep, jnp.zeros((W,), jnp.float32), K,
                                table)
            except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
                emit(kind="vmem_gather", rows=I, draws=M, block=block,
                     unroll=unroll, error=str(e)[:200])
                continue
            emit(kind="vmem_gather", rows=I, draws=M, block=block,
                 unroll=unroll, rows_per_s=M / dt, ms=dt * 1e3)

    with open(out_path, "a") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
