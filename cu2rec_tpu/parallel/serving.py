"""Distributed serving: full-catalog scoring + top-K over an item-sharded
mesh — the "all_gather for serving-time Q assembly or distributed top-K
merge" capability from SURVEY §5.

Each ``ip`` shard scores its item block on the MXU (``p @ Q_loc.T``),
takes a local top-k with globalized indices, and an ``all_gather`` +
re-top-k merges the per-shard candidates — the merge moves only
``n_ip × B × k`` entries instead of the full (B, I) score matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cu2rec_tpu.ops.topk import NEG_INF


def _shard_map(mesh):
    from cu2rec_tpu.parallel.sharded import shard_map_compat
    return shard_map_compat(mesh)


def distributed_topk(mesh: Mesh, p_rows, ub_rows, Q, item_bias, global_bias,
                     rated_items, rated_mask, k: int = 10,
                     n_items: int | None = None):
    """Top-k over the catalog with Q/item_bias sharded over mesh axis 'ip'.

    ``p_rows`` (B, F) and the rated-item masks are replicated; ``Q`` must
    be padded to a multiple of the ip size (``pad_model``/engine prepare
    handle this).  Returns (scores (B, k), item_ids (B, k)) with *global*
    item ids, identical to the single-device path up to score ties.
    """
    B = p_rows.shape[0]
    n_real = n_items if n_items is not None else Q.shape[0]

    def body(p_rows, ub_rows, Q_l, ib_l, mu, rated, rmask):
        ip = jax.lax.axis_index("ip")
        I_loc = Q_l.shape[0]
        offset = ip * I_loc
        scores = jnp.dot(p_rows, Q_l.T, preferred_element_type=jnp.float32)
        scores = (scores + mu + ub_rows[:, None]
                  + ib_l[None, :].astype(jnp.float32))
        # padding rows (global id >= n_items) must never be recommended
        gids = offset + jnp.arange(I_loc)
        scores = jnp.where(gids[None, :] < n_real, scores, NEG_INF)
        # mask rated items that live in this shard
        loc = rated - offset
        in_shard = rmask & (loc >= 0) & (loc < I_loc)
        cols = jnp.clip(loc, 0, I_loc - 1)
        rows = jnp.broadcast_to(jnp.arange(B)[:, None], cols.shape)
        scores = scores.at[rows, cols].min(
            jnp.where(in_shard, NEG_INF, jnp.float32(3.0e38)))
        k_loc = min(k, I_loc)
        vals, idx = jax.lax.top_k(scores, k_loc)
        idx = idx + offset
        if k_loc < k:  # tiny shards: pad candidates so the merge sees k
            vals = jnp.pad(vals, ((0, 0), (0, k - k_loc)),
                           constant_values=NEG_INF)
            idx = jnp.pad(idx, ((0, 0), (0, k - k_loc)))
        # merge candidates from all shards
        vals_all = jax.lax.all_gather(vals, "ip", axis=1, tiled=True)
        idx_all = jax.lax.all_gather(idx, "ip", axis=1, tiled=True)
        mvals, mpos = jax.lax.top_k(vals_all, k)
        midx = jnp.take_along_axis(idx_all, mpos, axis=1)
        return mvals, midx

    f = _shard_map(mesh)(
        body,
        in_specs=(P(), P(), P("ip", None), P("ip"), P(), P(), P()),
        out_specs=(P(), P()))
    return jax.jit(f)(p_rows, ub_rows, Q, item_bias,
                      jnp.asarray(global_bias, jnp.float32),
                      jnp.asarray(rated_items), jnp.asarray(rated_mask))


def sharded_ranking_eval(mesh: Mesh, model, train_csr, test_csr,
                         k: int = 10, batch_size: int = 1024,
                         max_users: int | None = None,
                         metrics: tuple = ("recall", "ndcg")) -> dict:
    """Mean top-k ranking metrics over test users, scored through the
    item-sharded serving path (the distributed analogue of
    serve.recommend.ranking_eval).

    ``model`` is an (unpadded) MFModel; Q/item_bias are padded to the ip
    size here and every batch runs ``distributed_topk``.
    """
    import numpy as np

    from cu2rec_tpu.ops.topk import ndcg_at_k, recall_at_k
    from cu2rec_tpu.parallel.sharded import pad_model
    from cu2rec_tpu.serve.recommend import padded_user_lists

    fns = {"recall": recall_at_k, "ndcg": ndcg_at_k}
    unknown = set(metrics) - fns.keys()
    if unknown:
        raise ValueError(f"unknown ranking metric(s): {sorted(unknown)}")
    n_ip = mesh.shape[mesh.axis_names[-1]]
    I_pad = -(-model.n_items // n_ip) * n_ip
    padded = pad_model(model, model.n_users, I_pad)

    test_counts = np.diff(test_csr.indptr)
    users = np.nonzero(test_counts > 0)[0]
    if max_users:
        users = users[:max_users]
    if len(users) == 0:
        return {m: 0.0 for m in metrics}
    totals = {m: 0.0 for m in metrics}
    n = 0
    for b0 in range(0, len(users), batch_size):
        batch = users[b0:b0 + batch_size]
        rated, rmask = padded_user_lists(train_csr, batch)
        uids = jnp.asarray(batch)
        _, rec = distributed_topk(
            mesh, padded.P[uids], padded.user_bias[uids], padded.Q,
            padded.item_bias, float(model.global_bias), rated, rmask,
            k=k, n_items=model.n_items)
        rel, relmask = padded_user_lists(test_csr, batch)
        rel, relmask = jnp.asarray(rel), jnp.asarray(relmask)
        for m in metrics:
            totals[m] += float(jnp.sum(fns[m](rec, rel, relmask)))
        n += len(batch)
    return {m: totals[m] / n for m in metrics}


def sharded_recall_at_k(mesh: Mesh, model, train_csr, test_csr,
                        k: int = 10, batch_size: int = 1024,
                        max_users: int | None = None) -> float:
    """Mean recall@k over test users through the item-sharded serving
    path (see :func:`sharded_ranking_eval`)."""
    return sharded_ranking_eval(mesh, model, train_csr, test_csr, k,
                                batch_size, max_users,
                                metrics=("recall",))["recall"]
