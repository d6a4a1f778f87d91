"""Model state: the biased matrix-factorization parameter tables.

The model is  r̂(u,i) = μ + b_u + b_i + p_u · q_i  (reference
matrix_factorization/util.cu:199-204).  The reference keeps P/Q as raw
cudaMalloc'd dense matrices (matrix.{h,cu}) plus bias arrays allocated in
training.cu:34-70; here they are one pytree of jax arrays, optionally
row-sharded over a device mesh (P/user_bias by user, Q/item_bias by item).

Initialization parity: the reference draws every table from
Normal(mean=0, std=1/n_factors) with mt19937 seed 42 (util.cu:124-144);
we use the same distribution from JAX's counter-based PRNG, one fold of the
seed per table (exact stream parity with mt19937 is impossible and not
required — RMSE-within-variance is the bar, SURVEY §7).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np


@dataclass
class MFModel:
    """Biased-MF parameters (a registered pytree)."""

    P: jax.Array          # (n_users, n_factors) user factors
    Q: jax.Array          # (n_items, n_factors) item factors
    user_bias: jax.Array  # (n_users,)
    item_bias: jax.Array  # (n_items,)
    global_bias: jax.Array  # () scalar μ, the mean training rating

    @property
    def n_users(self) -> int:
        return self.P.shape[0]

    @property
    def n_items(self) -> int:
        return self.Q.shape[0]

    @property
    def n_factors(self) -> int:
        return self.P.shape[1]


jtu.register_dataclass(
    MFModel,
    data_fields=["P", "Q", "user_bias", "item_bias", "global_bias"],
    meta_fields=[],
)

# Table names, in the component-export order of reference mf.cu:83-87.
COMPONENTS = ("p", "q", "user_bias", "item_bias", "global_bias")


def initialize_normal(key: jax.Array, shape, n_factors: int,
                      mean: float = 0.0, stddev: float = 1.0,
                      dtype=jnp.float32) -> jax.Array:
    """Normal(mean, stddev / n_factors) init (reference util.cu:124-132)."""
    return (jax.random.normal(key, shape, dtype=jnp.float32)
            * (stddev / n_factors) + mean).astype(dtype)


def init_model(n_users: int, n_items: int, n_factors: int,
               global_bias: float, seed: int = 42,
               dtype=jnp.float32,
               Q: jax.Array | None = None,
               item_bias: jax.Array | None = None) -> MFModel:
    """Create a freshly initialized model.

    Pass pre-trained ``Q``/``item_bias`` for the fold-in path (the second
    ``train`` overload in reference training.cu:206-217 initializes them;
    predict.cu:126 passes loaded ones).
    """
    key = jax.random.PRNGKey(seed)
    kP, kQ, kub, kib = (jax.random.fold_in(key, i) for i in range(4))
    if Q is None:
        Q = initialize_normal(kQ, (n_items, n_factors), n_factors, dtype=dtype)
    else:
        Q = jnp.asarray(Q, dtype=dtype).reshape(n_items, n_factors)
    if item_bias is None:
        item_bias = initialize_normal(kib, (n_items,), n_factors, dtype=dtype)
    else:
        item_bias = jnp.asarray(item_bias, dtype=dtype).reshape(n_items)
    return MFModel(
        P=initialize_normal(kP, (n_users, n_factors), n_factors, dtype=dtype),
        Q=Q,
        user_bias=initialize_normal(kub, (n_users,), n_factors, dtype=dtype),
        item_bias=item_bias,
        global_bias=jnp.asarray(global_bias, dtype=jnp.float32),
    )


def model_to_numpy(model: MFModel) -> dict[str, np.ndarray]:
    """D→H copy of all components (training.cu:179-185 equivalent)."""
    return {
        "p": np.asarray(model.P, dtype=np.float32),
        "q": np.asarray(model.Q, dtype=np.float32),
        "user_bias": np.asarray(model.user_bias, dtype=np.float32),
        "item_bias": np.asarray(model.item_bias, dtype=np.float32),
        "global_bias": np.asarray(model.global_bias, dtype=np.float32).reshape(1),
    }
