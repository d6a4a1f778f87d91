"""cu2rec_tpu — a TPU-native matrix-factorization recommender engine.

A from-scratch TPU-native JAX/XLA framework with the capabilities of the CUDA
library ``nickgreenquist/cu2rec`` (mounted read-only at /root/reference):
biased matrix factorization  r̂(u,i) = μ + b_u + b_i + p_u · q_i
(reference: matrix_factorization/util.cu:199-204) trained with massively
parallel SGD, RMSE/MAE evaluation, learning-rate plateau decay, model
export/restore, and a fold-in + full-catalog top-K serving path
(reference: matrix_factorization/predict.cu).

Design stance (TPU-first, not a port):
  * the reference's one-CUDA-thread-per-user Hogwild kernel
    (sgd.cu:22-74) becomes a *deterministic, vectorized, minibatched*
    update: every user samples one rated item per step, gradients are
    computed against the pre-step tables, and item-side collisions are
    resolved by an explicit, testable first-writer-wins policy
    (scatter-min winner election) instead of data races;
  * loss reduction (loss.cu:58-128's shared-memory tree reduction)
    is an XLA reduction; cross-device it is a ``psum`` over the mesh;
  * full-catalog scoring (predict.cu:17-29's CPU loop) is an MXU matmul
    ``P @ Q.T`` plus ``lax.top_k``;
  * multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map``
    (the reference is single-GPU and has no distributed backend at all).
"""

import os as _os

# CU2REC_PLATFORM=cpu[:N] forces the JAX backend for the CLIs/harnesses.
# Must run BEFORE the first `import jax` anywhere: TPU platform plugins
# can override a later jax_platforms config update at import time, so the
# env var and the config update are both applied here, at package import.
_plat = _os.environ.get("CU2REC_PLATFORM")
if _plat:
    _name, _, _n = _plat.partition(":")
    _os.environ["JAX_PLATFORMS"] = _name
    import jax as _jax

    _jax.config.update("jax_platforms", _name)
    if _n:
        _jax.config.update("jax_num_cpu_devices", int(_n))
del _os, _plat

from cu2rec_tpu.utils.config import Config
from cu2rec_tpu.models.state import MFModel, init_model
from cu2rec_tpu.train.trainer import train
from cu2rec_tpu.train.als import train_als
from cu2rec_tpu.train.bpr import train_bpr
from cu2rec_tpu.train.ials import train_ials
from cu2rec_tpu.data.ratings import read_ratings_csv
from cu2rec_tpu.data.csr import build_csr, CSRRatings

__version__ = "0.1.0"

__all__ = [
    "Config",
    "MFModel",
    "init_model",
    "train",
    "train_als",
    "train_bpr",
    "train_ials",
    "read_ratings_csv",
    "build_csr",
    "CSRRatings",
    "__version__",
]
