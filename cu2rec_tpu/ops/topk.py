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

NEG_INF = jnp.float32(-3.0e38)


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
