"""Prediction ops.

``get_prediction`` (reference util.cu:199-204) generalized to batches: the
full-catalog score of a block of users is one MXU matmul ``P_u @ Q.T`` plus
broadcast biases — replacing predict.cu's CPU scoring loop (predict.cu:17-29).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def predict_pairs(P, Q, user_bias, item_bias, global_bias, users, items):
    """r̂ for (user, item) pairs."""
    return (global_bias + user_bias[users] + item_bias[items]
            + jnp.sum(P[users] * Q[items], axis=-1))


def score_catalog(p_rows, ub_rows, Q, item_bias, global_bias):
    """Full-catalog scores for a block of users: (B, I) via the MXU.

    ``p_rows`` (B, F), ``ub_rows`` (B,).  bfloat16 inputs are contracted in
    float32 (preferred_element_type) for stable ranking.
    """
    scores = jnp.dot(p_rows, Q.T, preferred_element_type=jnp.float32)
    return (scores + global_bias + ub_rows[:, None]
            + item_bias[None, :].astype(jnp.float32))
