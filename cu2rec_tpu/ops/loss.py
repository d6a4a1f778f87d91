"""RMSE/MAE evaluation — TPU-native redesign of the reference loss path
(matrix_factorization/loss.cu).

The reference computes a per-rating error array with a one-thread-per-user
kernel walking each CSR slice (loss_kernel, loss.cu:19-35), then reduces it
with a hand-written shared-memory tree reduction templated over 10 block
sizes (total_loss_kernel, loss.cu:58-128) and finishes the sum on the CPU
(loss.cu:184-190).

Here the ragged per-user walk becomes a flat gather over the precomputed
``row_ids`` expansion (static shapes, no ragged control flow), the
arithmetic rides the VPU, and the reduction is a plain XLA reduction —
`lax.scan` chunks bound peak memory so 100M-rating Netflix eval never
materializes an (nnz, F) intermediate.  Cross-device, callers wrap the
partial sums in a ``psum`` (see cu2rec_tpu.parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cu2rec_tpu.data.csr import EVAL_WINDOW_CHUNK, DeviceRatings
from cu2rec_tpu.models.state import MFModel

# The windowed user-row path (below) engages only when the user table
# exceeds the VMEM fast-gather regime and the window fits it — measured
# boundaries from results/vmem-gather.jsonl (gathers from ≤16 MB tables
# run 3×: 246 vs 82 M rows/s).
_WINDOW_TABLE_MIN = 12 << 20
_WINDOW_MAX_BYTES = 16 << 20


def choose_window_span(attested_span: int, n_rows: int,
                       row_bytes: int) -> int:
    """The static window span to use, or 0 for the plain gather path.

    Eligibility: row_ids non-decreasing (``attested_span`` > 0 is the
    builder's attestation of the max row-range any eval chunk covers),
    the gathered-from table big enough that the large-table gather rate
    applies, and the window small enough to stay in the fast regime.
    Shared by the single-chip eval (against the full user table) and the
    dp-sharded eval (against each shard's LOCAL user table — see
    cu2rec_tpu.parallel.sharded)."""
    if (0 < attested_span < n_rows
            and n_rows * row_bytes > _WINDOW_TABLE_MIN
            and attested_span * row_bytes <= _WINDOW_MAX_BYTES):
        return attested_span
    return 0


def _window_span(dev: DeviceRatings, n_rows: int, row_bytes: int) -> int:
    return choose_window_span(dev.eval_span, n_rows, row_bytes)


def _window_rows(table, rows, span: int):
    """table[rows] where all ``rows`` (except masked pad entries, which
    may be 0) lie in a ``span``-wide ascending window starting at
    ``rows[0]``: dynamic-slice the window once, gather locally at the
    small-table rate."""
    n = table.shape[0]
    u0 = jnp.minimum(rows[0], n - span)
    win = jax.lax.dynamic_slice(
        table, (u0,) + (0,) * (table.ndim - 1), (span,) + table.shape[1:])
    return win[jnp.clip(rows - u0, 0, span - 1)]


def pairwise_errors(P, Q, user_bias, item_bias, global_bias,
                    rows, cols, vals):
    """error[k] = rating[k] − r̂(u_k, i_k)  (loss_kernel semantics,
    loss.cu:29-33)."""
    pred = (global_bias + user_bias[rows] + item_bias[cols]
            + jnp.sum(P[rows] * Q[cols], axis=-1))
    return vals - pred


def error_sums(P, Q, user_bias, item_bias, global_bias,
               rows, cols, vals, mask, chunk_size: int = 1 << 20):
    """(Σ err², Σ |err|) over masked ratings, chunked to bound memory.

    The input arrays must be padded to a multiple of ``chunk_size`` is NOT
    required — a tail chunk is handled by padding here if needed; callers
    that pre-pad (DeviceRatings with pad_multiple=chunk) avoid the copy.
    """
    n = rows.shape[0]
    if n <= chunk_size:
        err = pairwise_errors(P, Q, user_bias, item_bias, global_bias,
                              rows, cols, vals)
        err = jnp.where(mask, err, 0.0)
        return jnp.sum(err * err), jnp.sum(jnp.abs(err))

    n_chunks = -(-n // chunk_size)
    padded = n_chunks * chunk_size

    def pad(x, fill=0):
        return jnp.pad(x, (0, padded - n), constant_values=fill)

    rows_c = pad(rows).reshape(n_chunks, chunk_size)
    cols_c = pad(cols).reshape(n_chunks, chunk_size)
    vals_c = pad(vals).reshape(n_chunks, chunk_size)
    mask_c = pad(mask, False).reshape(n_chunks, chunk_size)

    def body(carry, chunk):
        sse, sae = carry
        r, c, v, m = chunk
        err = pairwise_errors(P, Q, user_bias, item_bias, global_bias, r, c, v)
        err = jnp.where(m, err, 0.0)
        return (sse + jnp.sum(err * err), sae + jnp.sum(jnp.abs(err))), None

    (sse, sae), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.float32(0.0)),
        (rows_c, cols_c, vals_c, mask_c))
    return sse, sae


def _chunked(dev: DeviceRatings, chunk_size: int):
    """Pad + reshape the flat rating arrays into scan chunks."""
    n = dev.indices.shape[0]
    mask = jnp.arange(n, dtype=jnp.int32) < jnp.int32(dev.nnz)
    n_chunks = max(-(-n // chunk_size), 1)
    padded = n_chunks * chunk_size

    def pad(x, fill=0):
        return jnp.pad(x, (0, padded - n), constant_values=fill)

    return (pad(dev.row_ids).reshape(n_chunks, -1),
            pad(dev.indices).reshape(n_chunks, -1),
            pad(dev.data).reshape(n_chunks, -1),
            pad(mask, False).reshape(n_chunks, -1))


def _scan_error_sums(dev: DeviceRatings, chunk_size: int, chunk_err):
    """(Σ err², Σ |err|) with ``chunk_err(rows, cols, vals, mask)``
    evaluated per scan chunk."""
    def body(carry, chunk):
        sse, sae = carry
        err = chunk_err(*chunk)
        return (sse + jnp.sum(err * err), sae + jnp.sum(jnp.abs(err))), None

    (sse, sae), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)),
                                 _chunked(dev, chunk_size))
    return sse, sae


@partial(jax.jit, static_argnames=("chunk_size",))
def _eval_jit(model: MFModel, dev: DeviceRatings, chunk_size: int):
    span = _window_span(dev, model.P.shape[0], model.P.shape[1] * 4)
    if span == 0:
        n = dev.indices.shape[0]
        mask = jnp.arange(n, dtype=jnp.int32) < jnp.int32(dev.nnz)
        sse, sae = error_sums(model.P, model.Q, model.user_bias,
                              model.item_bias, model.global_bias,
                              dev.row_ids, dev.indices, dev.data, mask,
                              chunk_size)
    else:
        def chunk_err(rows, cols, vals, m):
            ru = _window_rows(model.P, rows, span)
            pred = (model.global_bias + model.user_bias[rows]
                    + model.item_bias[cols]
                    + jnp.sum(ru * model.Q[cols], axis=-1))
            return jnp.where(m, vals - pred, 0.0)

        sse, sae = _scan_error_sums(dev, EVAL_WINDOW_CHUNK, chunk_err)
    denom = jnp.float32(dev.nnz)
    return jnp.sqrt(sse / denom), sae / denom


def _cap_eval_chunk(chunk_size: int, width: int) -> int:
    """Width-aware eval chunk: keep each scan step's gathered-row
    scratch (a few × chunk × width × 4 B) bounded so wide-table evals
    don't OOM alongside a resident solver working set.  512 MiB per
    gathered array leaves the F<=128 chunking exactly as measured
    (1 Mi rows); at F=300 (W=304) it caps at ~426 K rows — the r5
    Netflix-F=300 per-chunk ALS journey OOMed in eval without this.
    """
    cap = (512 << 20) // max(width * 4, 1)
    if cap >= chunk_size:
        return chunk_size
    return max((cap // 16384) * 16384, 16384)


def evaluate(model: MFModel, dev: DeviceRatings,
             chunk_size: int = 1 << 20):
    """(RMSE, MAE) over a device ratings set — the equivalent of
    ``calculate_loss_gpu`` + ``get_error_metrics_gpu`` (loss.cu:40-49,
    150-200)."""
    chunk_size = _cap_eval_chunk(chunk_size, model.P.shape[1])
    rmse, mae = _eval_jit(model, dev, chunk_size)
    return float(rmse), float(mae)


@partial(jax.jit, static_argnames=("chunk_size",))
def _eval_packed_jit(pm, dev: DeviceRatings, chunk_size: int):
    """Eval over packed tables: one row gather per side fetches factors and
    bias together (see cu2rec_tpu.ops.packed).

    When the user table is past the VMEM fast-gather regime and the
    builder attested ascending row_ids (``dev.eval_span``), the user rows
    come through :func:`_window_rows` — measured 3.2× end-to-end at
    ML-20M scale (0.470 → 0.147 s, results/eval-probe.jsonl)."""
    F = pm.n_factors
    W = pm.width
    col = jnp.arange(W)
    factor = (col < F).astype(jnp.float32)
    biascol = (col == F).astype(jnp.float32)
    span = _window_span(dev, pm.T_u.shape[0], W * 4)

    def chunk_err(rows, cols, vals, m):
        if span == 0:
            ru = pm.T_u[rows].astype(jnp.float32)
        else:
            ru = _window_rows(pm.T_u, rows, span).astype(jnp.float32)
        ri = pm.T_i[cols].astype(jnp.float32)
        ihat = ri * factor + biascol
        pred = pm.global_bias + jnp.sum(ru * ihat, axis=-1) + ri[:, F]
        return jnp.where(m, vals - pred, 0.0)

    sse, sae = _scan_error_sums(
        dev, EVAL_WINDOW_CHUNK if span else chunk_size, chunk_err)
    denom = jnp.float32(dev.nnz)
    return jnp.sqrt(sse / denom), sae / denom


def evaluate_packed(pm, dev: DeviceRatings, chunk_size: int = 1 << 20):
    chunk_size = _cap_eval_chunk(chunk_size, pm.width)
    rmse, mae = _eval_packed_jit(pm, dev, chunk_size)
    return float(rmse), float(mae)


def metrics_from_errors(errors: jax.Array):
    """(MAE, RMSE) from a per-rating error vector
    (get_error_metrics semantics, loss.cu:132-143)."""
    n = errors.shape[0]
    return (jnp.sum(jnp.abs(errors)) / n,
            jnp.sqrt(jnp.sum(errors * errors) / n))
