#!/usr/bin/env python
"""Measure the dp-sharded windowed eval (parallel/sharded._eval_local_packed
span path) against the plain sharded gather — the sharded counterpart of
results/eval-probe.jsonl (round-2 verdict item 4: the 3× windowed win
engaged only single-chip).

Runs the REAL ShardedEngine eval program (shard_map + all_gather + psum),
timed with span=0 (plain) vs the attested span (windowed), exactness-
checked against each other.  On the TPU chip this uses a dp=1 mesh (the
full user table is the local table — same regime as ML-20M dp=1); with
--cpu it runs dp=8 on the virtual mesh at reduced scale for the relative
ratio across shard counts.

One JSON line per measurement → results/sharded-eval-probe.jsonl.
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
    os.environ["CU2REC_PLATFORM"] = "cpu:8"

import jax
import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.data.csr import csr_from_arrays
from cu2rec_tpu.data.synth import generate_planted
from cu2rec_tpu.models.state import init_model
from cu2rec_tpu.ops.loss import choose_window_span
from cu2rec_tpu.parallel.sharded import ShardedEngine, make_mesh
from cu2rec_tpu.utils.cache import enable_compile_cache
from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.utils.timing import fetch_barrier

enable_compile_cache()


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--users", type=int, default=138_000)
    p.add_argument("--items", type=int, default=27_000)
    p.add_argument("--ratings", type=int, default=20_000_000)
    p.add_argument("--factors", type=int, default=100)
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    if args.cpu:
        # Sized so the window regime engages per shard at dp=8: local
        # table 30K users (~12.5 MB at W=104) and ~2M local ratings
        # (several EVAL_WINDOW_CHUNKs, span ≈ 4K users per chunk).
        args.users, args.items, args.ratings = 240_000, 2_000, 16_000_000
        args.reps = min(args.reps, 2)
        if args.dp == 1:
            args.dp = 8

    out_path = os.path.join(ROOT, "results", "sharded-eval-probe.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    records = []

    def emit(**kw):
        kw["backend"] = jax.default_backend()
        records.append(kw)
        print(json.dumps(kw), flush=True)

    U, I, R, F = args.users, args.items, args.ratings, args.factors
    d = generate_planted(U, I, R, n_factors=20, noise=0.30, seed=0)
    csr = csr_from_arrays(d.users, d.items, d.ratings, U, I)
    cfg = Config(total_iterations=1, n_factors=F)
    engine = ShardedEngine(csr, csr, cfg, mesh=make_mesh(args.dp, 1))
    state = engine.prepare(init_model(U, I, F, 3.6, seed=42))
    ratings_t = engine._ratings_tuple(engine.train_sh)
    nnz = jnp.int32(engine.train_sh.total_nnz)
    U_loc = engine.U_pad // args.dp
    W = int(state[0].shape[1])
    span = choose_window_span(engine.train_sh.eval_span, U_loc, W * 4)

    def timed(span_val):
        rmse, mae = engine._evaluate_jit(state, ratings_t, nnz, span_val)
        fetch_barrier(rmse)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            rmse, mae = engine._evaluate_jit(state, ratings_t, nnz,
                                             span_val)
            fetch_barrier(rmse)
        return ((time.perf_counter() - t0) / args.reps,
                float(rmse), float(mae))

    dt0, rmse0, mae0 = timed(0)
    emit(kind="sharded_eval_plain", dp=args.dp, nnz=R, factors=F,
         s=round(dt0, 4), rmse=round(rmse0, 6))
    if span == 0:
        emit(kind="sharded_eval_windowed", dp=args.dp, skipped=True,
             reason=f"window regime not engaged (attested span "
                    f"{engine.train_sh.eval_span}, U_loc {U_loc})")
    else:
        dt1, rmse1, mae1 = timed(span)
        emit(kind="sharded_eval_windowed", dp=args.dp, nnz=R, factors=F,
             span=span, s=round(dt1, 4), rmse=round(rmse1, 6),
             speedup=round(dt0 / dt1, 2),
             exact_vs_plain=bool(
                 np.isclose(rmse1, rmse0, rtol=0, atol=1e-6)
                 and np.isclose(mae1, mae0, rtol=0, atol=1e-6)))

    with open(out_path, "a") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
