"""Checkpointing: the reference's CSV export contract + a native format
with real mid-run resume.

Reference behavior: training writes the full model as five CSVs at the end
(mf.cu:83-87; naming util.cu:99-103: ``{base}_f{F}_{p,q,user_bias,
item_bias,global_bias}.csv``) and ``predict`` restores Q/item_bias/
global_bias from them (predict.cu:110-113).  Mid-run resume was vestigial:
``cur_iterations`` was tracked (training.cu:170) and persistable
(config.cu:15-22) but never used to skip work.

Here both exist: the identical CSV contract for drop-in compatibility, and
an ``.npz`` checkpoint carrying every component *plus* the full training
state (iteration count, current learning rate, patience, seed), so
interrupted runs genuinely resume (SURVEY §5 gap).
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from cu2rec_tpu.data.ratings import load_matrix, write_component
from cu2rec_tpu.models.state import MFModel, model_to_numpy
from cu2rec_tpu.utils.config import Config


def export_components(model: MFModel, parent_dir: str, base: str,
                      n_factors: int) -> list[str]:
    """Write the five component CSVs (mf.cu:83-87 contract)."""
    comps = model_to_numpy(model)
    U, F = comps["p"].shape
    I = comps["q"].shape[0]
    paths = [
        write_component(parent_dir, base, "p", comps["p"], U, F, n_factors),
        write_component(parent_dir, base, "q", comps["q"], I, F, n_factors),
        write_component(parent_dir, base, "user_bias", comps["user_bias"],
                        U, 1, n_factors),
        write_component(parent_dir, base, "item_bias", comps["item_bias"],
                        I, 1, n_factors),
        write_component(parent_dir, base, "global_bias",
                        comps["global_bias"], 1, 1, n_factors),
    ]
    return paths


def load_item_components(q_path: str, item_bias_path: str,
                         global_bias_path: str):
    """Load the serving-side components (predict.cu:110-113)."""
    Q = load_matrix(q_path)
    item_bias = load_matrix(item_bias_path).reshape(-1)
    global_bias = float(load_matrix(global_bias_path).reshape(-1)[0])
    return Q, item_bias, global_bias


def save_checkpoint(path: str, model: MFModel, cfg: Config,
                    extra: dict | None = None) -> str:
    import os

    import jax
    if jax.process_count() > 1:
        # Multi-process mesh: the tables are globally sharded (each
        # process holds only its addressable shards), so materialize the
        # full arrays on every process before the numpy conversion —
        # np.asarray on a non-fully-addressable array raises.  The
        # allgather is a collective EVERY process must enter; every
        # process then writes via its own temp + atomic rename (below),
        # so hosts WITHOUT a shared filesystem each get a complete
        # checkpoint, and on a shared filesystem the concurrent renames
        # are atomic last-writer-wins with identical bytes — no torn
        # window either way.
        from jax.experimental import multihost_utils as mhu
        model = MFModel(
            P=mhu.process_allgather(model.P, tiled=True),
            Q=mhu.process_allgather(model.Q, tiled=True),
            user_bias=mhu.process_allgather(model.user_bias, tiled=True),
            item_bias=mhu.process_allgather(model.item_bias, tiled=True),
            # global_bias is replicated (fully addressable): plain
            # float() works; process_allgather(tiled=) does not apply
            # to a scalar.
            global_bias=np.float32(model.global_bias),
        )
    final = path if path.endswith(".npz") else path + ".npz"
    comps = model_to_numpy(model)
    meta = {"config": dataclasses.asdict(cfg), "extra": extra or {}}
    # Write-then-rename: a concurrent reader (or a crash mid-write) sees
    # either the previous complete checkpoint or the new one, never a
    # truncated file.  The (process_index, pid) temp name keeps
    # multi-process writers (identical post-allgather bytes) from
    # clobbering each other's in-progress temp — pid alone is only
    # unique per host, so two ranks on different hosts sharing a
    # filesystem could collide on the same tmp path and the loser's
    # os.replace would raise after the winner renamed it away.
    tmp = f"{final}.tmp.{jax.process_index()}.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, meta=np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8), **comps)
    os.replace(tmp, final)
    if jax.process_count() > 1:
        # Resume paths load the file immediately after saving (tests do);
        # don't let rank>0 race ahead of rank 0's rename.
        from jax.experimental import multihost_utils as mhu
        mhu.sync_global_devices("cu2rec_checkpoint_saved")
    return final


def load_checkpoint(path: str):
    """Returns (model, cfg, extra)."""
    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        model = MFModel(
            P=jnp.asarray(z["p"]),
            Q=jnp.asarray(z["q"]),
            user_bias=jnp.asarray(z["user_bias"]),
            item_bias=jnp.asarray(z["item_bias"]),
            global_bias=jnp.asarray(z["global_bias"].reshape(())),
        )
    cfg = Config(**{k: v for k, v in meta["config"].items()
                    if k in {f.name for f in dataclasses.fields(Config)}})
    return model, cfg, meta.get("extra", {})
