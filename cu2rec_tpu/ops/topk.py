"""Top-K recommendation ops.

Replaces the reference's CPU ``std::sort`` over all items
(predict.cu:49-63) with masked ``lax.top_k`` on device.  Rated items are
excluded by scatter-masking to -inf (the reference filtered them during a
merge walk that assumed sorted ratings and could run past ``end()`` —
predict.cu:52-59; masking has no such edge cases).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalar, not jnp: a module-level jnp constant initializes the JAX
# backend at IMPORT time, which blocks forever on a machine whose
# accelerator runtime is unreachable (measured: the dead-relay hang,
# docs/R5_CHANGES.md) — importing the package must not touch the device.
NEG_INF = np.float32(-3.0e38)


def mask_rated(scores: jax.Array, rated_items: jax.Array,
               rated_mask: jax.Array) -> jax.Array:
    """Set scores of rated items to -inf.

    ``scores`` (B, I); ``rated_items`` (B, R) padded item ids with validity
    ``rated_mask`` (B, R)."""
    cols = jnp.where(rated_mask, rated_items, 0)
    # scatter-min: valid entries write -inf; padding entries write +huge,
    # which min() turns into a no-op.
    B = scores.shape[0]
    rowsc = jnp.broadcast_to(jnp.arange(B)[:, None], cols.shape)
    return scores.at[rowsc, cols].min(jnp.where(rated_mask, NEG_INF,
                                                jnp.float32(3.0e38)))


@partial(jax.jit, static_argnames=("k",))
def topk_scores(scores: jax.Array, k: int):
    """(values, item_ids) of the top-k per row."""
    return jax.lax.top_k(scores, k)


def recall_at_k(recommended: jax.Array, relevant_items: jax.Array,
                relevant_mask: jax.Array) -> jax.Array:
    """Per-user recall@k.

    ``recommended`` (B, K) item ids; ``relevant_items`` (B, R) padded held-out
    item ids with validity ``relevant_mask``."""
    hits = (recommended[:, :, None] == relevant_items[:, None, :])
    hits = hits & relevant_mask[:, None, :]
    n_hit = jnp.sum(jnp.any(hits, axis=1), axis=-1)
    n_rel = jnp.maximum(jnp.sum(relevant_mask, axis=-1), 1)
    return n_hit / n_rel


def ndcg_at_k(recommended: jax.Array, relevant_items: jax.Array,
              relevant_mask: jax.Array) -> jax.Array:
    """Per-user binary-relevance NDCG@k.

    Position-discounted hit quality: DCG = Σ_j rel_j / log2(j+2) over the
    recommendation list, normalized by the ideal DCG for that user's
    held-out count (clipped at k).  Same (B, K)/(B, R) padded layout as
    :func:`recall_at_k`; shape-static so it jits into the same serving
    program."""
    hits = (recommended[:, :, None] == relevant_items[:, None, :])
    hits = hits & relevant_mask[:, None, :]
    rel = jnp.any(hits, axis=-1).astype(jnp.float32)          # (B, K)
    K = recommended.shape[1]
    disc = 1.0 / jnp.log2(jnp.arange(K, dtype=jnp.float32) + 2.0)
    dcg = jnp.sum(rel * disc, axis=-1)
    n_rel = jnp.sum(relevant_mask, axis=-1)                   # (B,)
    ideal = jnp.sum(
        jnp.where(jnp.arange(K)[None, :] < n_rel[:, None], disc[None, :],
                  0.0), axis=-1)
    # Users with no held-out items score 0 (ideal==0 there).
    return jnp.where(ideal > 0, dcg / jnp.maximum(ideal, 1e-9), 0.0)
