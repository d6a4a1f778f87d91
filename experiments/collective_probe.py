#!/usr/bin/env python
"""Measured (not modeled) multi-device step decomposition + collective
costs on the virtual CPU mesh — VERDICT r1 items 5/9.

Two questions, answered with data:

1. How does wall-time per step scale at dp ∈ {1,2,4,8} for each collision
   policy?  (CPU-mesh numbers are noisy proxies for ICI, but they expose
   the *relative* cost of the collectives and any I-proportional Amdahl
   terms — the absolute ceiling needs real multi-chip hardware.)

2. Dense item-exchange (psum of the (I/ip, W) delta/row buffer over dp,
   what we ship) vs a routed all-to-all exchange (winner rows only,
   payload ∝ U_loc×W): which moves fewer bytes at MovieLens/Netflix
   shapes?  The north star names all_to_all; the measurement shows dense
   psum moves FEWER bytes whenever I ≤ U/n_dp (all MovieLens/Netflix
   configs), because every user samples every step so winner count ≈
   min(U_loc, I) — the "sparse" exchange is not sparse here.

Usage: CU2REC_PLATFORM=cpu:8 python experiments/collective_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

os.environ.setdefault("CU2REC_PLATFORM", "cpu:8")

from cu2rec_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(fn, *args, reps=5):
    from cu2rec_tpu.utils.timing import fetch_barrier
    out = fn(*args)
    fetch_barrier(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch_barrier(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def step_scaling(U=32_768, I=8_192, R=2_000_000, F=32, n_steps=20):
    from cu2rec_tpu.data.csr import csr_from_arrays
    from cu2rec_tpu.models.state import init_model
    from cu2rec_tpu.ops.sgd import Hyper
    from cu2rec_tpu.parallel.sharded import ShardedEngine, make_mesh
    from cu2rec_tpu.utils.config import Config

    rng = np.random.default_rng(0)
    users = rng.integers(0, U, R).astype(np.int32)
    items = (I * rng.power(0.3, R)).astype(np.int32) % I
    vals = rng.uniform(1, 5, R).astype(np.float32)
    csr = csr_from_arrays(users, items, vals, U, I)
    hp = Hyper(*(jnp.float32(x) for x in (0.01, 0.02, 0.02, 0.02, 0.02)))

    rows = []
    for policy in ("first_wins", "twin"):
        for dp in (1, 2, 4, 8):
            cfg = Config(n_factors=F, collision_policy=policy)
            eng = ShardedEngine(csr, csr, cfg, mesh=make_mesh(dp, 1))
            state = eng.init_model(U, I, 3.5)
            # warm + compile
            state = eng.run(state, hp, 0, n_steps)
            from cu2rec_tpu.utils.timing import fetch_barrier
            fetch_barrier(state[0])
            t0 = time.perf_counter()
            state = eng.run(state, hp, n_steps, n_steps)
            fetch_barrier(state[0])
            dt = (time.perf_counter() - t0) / n_steps
            rows.append(dict(kind="step", policy=policy, dp=dp,
                             ms_per_step=round(dt * 1e3, 3),
                             updates_per_s=round(U / dt / 1e6, 1)))
            print(rows[-1], flush=True)
    return rows


def collective_costs(I=27_000, U_loc=17_250, W=128, n_dp=8):
    """Isolated cost of the item-exchange alternatives on the mesh."""
    from functools import partial
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cu2rec_tpu.parallel.sharded import shard_map_compat
    shard_map = shard_map_compat()

    mesh = Mesh(np.asarray(jax.devices()[:n_dp]), ("dp",))
    I_pad = -(-I // 128) * 128
    dense = jnp.zeros((n_dp, I_pad, W), jnp.float32)
    dense = jax.device_put(dense, NamedSharding(mesh, P("dp", None, None)))
    routed = jnp.zeros((n_dp, n_dp, U_loc // n_dp + 1, W + 2), jnp.float32)
    routed = jax.device_put(routed,
                            NamedSharding(mesh, P("dp", None, None, None)))
    prio = jnp.zeros((n_dp, I_pad), jnp.int32)
    prio = jax.device_put(prio, NamedSharding(mesh, P("dp", None)))

    @jax.jit
    def do_psum(x):
        return shard_map(lambda l: jax.lax.psum(l[0], "dp"), mesh=mesh,
                         in_specs=(P("dp", None, None),),
                         out_specs=P())(x)

    @jax.jit
    def do_pmin(x):
        return shard_map(lambda l: jax.lax.pmin(l[0], "dp"), mesh=mesh,
                         in_specs=(P("dp", None),), out_specs=P())(x)

    @jax.jit
    def do_a2a(x):
        # local block (1, n_dp, cap, W+2) → [0] → (n_dp, cap, W+2);
        # tiled all_to_all over dim 0 keeps rank 3.
        return shard_map(
            lambda l: jax.lax.all_to_all(l[0], "dp", split_axis=0,
                                         concat_axis=0, tiled=True),
            mesh=mesh, in_specs=(P("dp", None, None, None),),
            out_specs=P("dp", None, None))(x)

    rows = []
    for name, fn, arg, nbytes in [
        ("psum_dense_IxW", do_psum, dense, I_pad * W * 4),
        ("pmin_election_I", do_pmin, prio, I_pad * 4),
        ("all_to_all_routed_UlocxW", do_a2a, routed,
         (U_loc // n_dp + 1) * n_dp * (W + 2) * 4),
    ]:
        dt = timed(fn, arg, reps=10)
        rows.append(dict(kind="collective", name=name, n_dp=n_dp,
                         payload_mb_per_shard=round(nbytes / 1e6, 2),
                         ms=round(dt * 1e3, 3)))
        print(rows[-1], flush=True)
    return rows


def main():
    out = os.path.join(os.path.dirname(__file__), os.pardir, "results",
                       "collective-probe.jsonl")
    rows = step_scaling() + collective_costs()
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
