#!/usr/bin/env python
"""Per-phase decomposition of the ALS half-sweep at ML-20M scale — the
gather_roofline.py treatment applied to ALS (round-2 verdict item 2:
~0.5 s of the 0.87 s sweep was unattributed while ROADMAP claimed
"Gram-gather-bound").

Phases measured as CUMULATIVE jitted programs over the real prepared
chunks (same optimization_barrier chaining as the shipped fused sweep, so
peak-memory behavior matches):

  gather       — T_other[cols] row gathers only
  gather_x     — + mask/astype + X = [q | 1] materialization
  gather_gram  — + the (B,D,F1)x(B,D,F1) Gram einsum
  gram_rhs     — + the rhs einsum
  full         — the shipped als_half_sweep (adds reg, solve, scatter)

Successive differences attribute the sweep's time.  Also measured:
  gram_noX     — Gram/rhs WITHOUT materializing X (blocks from q*mask:
                 G = [[qm'qm, qm'1],[1'qm, deg]]) — is the concat real?

Padding accounting is printed per bucket (padded slots vs true nnz):
the row gathers ride the measured 82 M rows/s large-table ceiling and
padding multiplies that dominant term directly.

Appends one JSON line per measurement to results/als-decompose.jsonl.
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
from functools import partial

from cu2rec_tpu.data.csr import csr_from_arrays, transpose_csr
from cu2rec_tpu.models.state import init_model
from cu2rec_tpu.ops.als import als_half_sweep, prepare_chunks_device
from cu2rec_tpu.ops.packed import pack
from cu2rec_tpu.utils.timing import fetch_barrier


def phase_program(phase: str, F: int):
    """One jitted program running ``phase`` over every chunk, chained
    with optimization_barrier like the shipped fused sweep.  Chunk
    arrays are jit ARGUMENTS (closing over them embeds them as program
    constants and the remote compile request body explodes past the
    tunnel's length limit — HTTP 413)."""

    @partial(jax.jit, static_argnames=())
    def prog(T_other, mu, regs, heavies):
        acc = jnp.float32(0.0)
        for parts in regs + heavies:
            cols, vals, mask = parts[0], parts[1], parts[2]
            T_dep, acc = jax.lax.optimization_barrier((T_other, acc))
            other = T_dep[cols]
            if phase == "gather":
                acc = acc + jnp.sum(other * mask[..., None].astype(
                    other.dtype))
                continue
            q = other[..., :F].astype(jnp.float32)
            b_other = other[..., F].astype(jnp.float32)
            m = mask.astype(jnp.float32)[..., None]
            X = jnp.concatenate(
                [q, jnp.ones_like(b_other)[..., None]], axis=-1) * m
            y = (vals - mu - b_other) * mask
            if phase == "gather_x":
                acc = acc + jnp.sum(X) + jnp.sum(y)
                continue
            if phase == "gram_noX":
                qm = q * m
                Gqq = jnp.einsum("bdf,bdg->bfg", qm, qm,
                                 preferred_element_type=jnp.float32)
                Gq1 = jnp.sum(qm, axis=1)
                deg = jnp.sum(m[..., 0], axis=1)
                rqs = jnp.einsum("bdf,bd->bf", qm, y,
                                 preferred_element_type=jnp.float32)
                r1 = jnp.sum(y, axis=1)
                acc = (acc + jnp.sum(Gqq) + jnp.sum(Gq1) + jnp.sum(deg)
                       + jnp.sum(rqs) + jnp.sum(r1))
                continue
            G = jnp.einsum("bdf,bdg->bfg", X, X,
                           preferred_element_type=jnp.float32)
            if phase == "gather_gram":
                acc = acc + jnp.sum(G)
                continue
            rhs = jnp.einsum("bdf,bd->bf", X, y,
                             preferred_element_type=jnp.float32)
            acc = acc + jnp.sum(G) + jnp.sum(rhs)  # gram_rhs
        return acc

    return prog


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=138_000)
    p.add_argument("--items", type=int, default=27_000)
    p.add_argument("--ratings", type=int, default=20_000_000)
    p.add_argument("--factors", type=int, default=100)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--side", choices=["user", "item", "both"],
                   default="both")
    args = p.parse_args()

    out_path = os.path.join(ROOT, "results", "als-decompose.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    records = []

    def emit(**kw):
        kw["backend"] = jax.default_backend()
        records.append(kw)
        print(json.dumps(kw), flush=True)

    rng = np.random.default_rng(0)
    U, I, R, F = args.users, args.items, args.ratings, args.factors
    users = rng.integers(0, U, R).astype(np.int32)
    pop = (1.0 / np.arange(1, I + 1)) ** 0.8
    items = rng.choice(I, size=R, p=pop / pop.sum()).astype(np.int32)
    vals = rng.uniform(0.5, 5.0, R).astype(np.float32)
    csr = csr_from_arrays(users, items, vals, U, I)
    mu = jnp.float32(float(vals.mean()))

    pm = pack(init_model(U, I, F, float(mu), seed=42))
    it_indptr, it_rows, it_vals = transpose_csr(csr)

    sides = []
    if args.side in ("user", "both"):
        sides.append(("user", prepare_chunks_device(
            jnp.asarray(csr.indices), jnp.asarray(csr.data), csr.indptr,
            F, U, csr.nnz), pm.T_i, pm.T_u))
    if args.side in ("item", "both"):
        sides.append(("item", prepare_chunks_device(
            jnp.asarray(it_rows), jnp.asarray(it_vals), it_indptr, F, I,
            csr.nnz), pm.T_u, pm.T_i))

    for side, chunks, T_other, T_self in sides:
        # Padding accounting: gathered slots vs true ratings.
        slots = sum(int(np.prod(ch[1].shape)) for ch in chunks)
        real = sum(int(np.asarray(jnp.sum(ch[3])))
                   for ch in chunks)  # mask sum
        emit(kind="als_padding", side=side, ratings=R, factors=F,
             padded_slots=slots, true_nnz=real,
             waste=round(slots / max(real, 1), 3),
             n_chunks=len(chunks),
             chunk_shapes=[list(ch[1].shape) for ch in chunks])

        def timed(fn, *a):
            out = fn(*a)
            fetch_barrier(out)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(*a)
                fetch_barrier(out)
            return (time.perf_counter() - t0) / args.reps

        regs = tuple(ch[1:] for ch in chunks if ch[0] == "reg")
        heavies = tuple(ch[1:] for ch in chunks if ch[0] == "heavy")
        prev = 0.0
        for phase in ("gather", "gather_x", "gather_gram", "gram_rhs",
                      "gram_noX"):
            prog = phase_program(phase, F)
            dt = timed(prog, T_other, mu, regs, heavies)
            emit(kind="als_phase", side=side, phase=phase, s=round(dt, 4),
                 delta_vs_prev=(round(dt - prev, 4)
                                if phase != "gram_noX" else None))
            if phase != "gram_noX":
                prev = dt

        # The shipped full half-sweep (adds reg-add, solve, scatter).
        def full(T_self, T_other):
            return als_half_sweep(T_self, T_other, chunks, mu, 0.02, 0.02,
                                  F)
        dt = timed(full, T_self, T_other)
        emit(kind="als_phase", side=side, phase="full", s=round(dt, 4),
             delta_vs_prev=round(dt - prev, 4))

    with open(out_path, "a") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
