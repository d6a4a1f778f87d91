"""Host-side CSR build + device-resident ratings container.

Reference parity: ``createSparseMatrix`` (util.cu:152-179) builds CSR from
user-sorted ratings, filling gaps for missing users by repeating indptr
values; ``CudaCSRMatrix`` (matrix.{h,cu}) owns the device copies.

TPU-native design: the CSR triplet lives as three HBM-resident ``jnp``
arrays with static shapes.  ``row_ids`` (the expansion of indptr back to a
per-nonzero user id) is precomputed host-side so evaluation can gather user
rows without ragged control flow; ratings are optionally padded to a
multiple of the eval chunk so jitted eval sees one static shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cu2rec_tpu.data.ratings import RatingsData


@dataclass
class CSRRatings:
    """Host CSR ratings matrix (counts/indices int32, data float32)."""

    indptr: np.ndarray    # (n_users + 1,)
    indices: np.ndarray   # (nnz,) item ids
    data: np.ndarray      # (nnz,) ratings
    n_users: int
    n_items: int

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    @property
    def row_ids(self) -> np.ndarray:
        """Per-nonzero user id (inverse of indptr)."""
        counts = np.diff(self.indptr)
        return np.repeat(np.arange(self.n_users, dtype=np.int32), counts)


def build_csr(ratings: RatingsData, n_users: int | None = None,
              n_items: int | None = None) -> CSRRatings:
    """Build CSR from ratings sorted by user id.

    Precondition (same as reference util.cu:149-150): rows sorted by userID.
    Missing users appear as repeated indptr values (util.cu:159-164) —
    counts+cumsum reproduces that exactly.
    """
    n_users = ratings.n_users if n_users is None else n_users
    n_items = ratings.n_items if n_items is None else n_items
    u = ratings.users
    if u.shape[0] > 1 and np.any(np.diff(u) < 0):
        raise ValueError("ratings must be sorted by user id (use "
                         "cu2rec_tpu.data.sort.sort_ratings first)")
    counts = np.bincount(u, minlength=n_users).astype(np.int64)
    indptr = np.zeros(n_users + 1, dtype=np.int32)
    np.cumsum(counts, out=indptr[1:])
    return CSRRatings(
        indptr=indptr,
        indices=ratings.items.astype(np.int32),
        data=ratings.ratings.astype(np.float32),
        n_users=n_users,
        n_items=n_items,
    )


def normalize_csr_dims(csr: CSRRatings, n_users: int,
                       n_items: int) -> CSRRatings:
    """Grow a CSR's dimensions to (n_users, n_items) without moving data.

    Growing the user axis appends empty rows (repeated indptr values — the
    missing-user convention of util.cu:159-164); growing the item axis is
    metadata only.  Shrinking raises: it would drop ratings.  Used to align
    a test-split CSR with the train CSR's dimensions so evaluation indexes
    the same parameter tables (the reference's preprocessing guarantees
    test ⊆ train ids via add_missing=False, map_items.py:43-53, but its
    loss kernel would silently read out of bounds otherwise).
    """
    if n_users < csr.n_users or n_items < csr.n_items:
        raise ValueError(
            f"cannot shrink CSR dims ({csr.n_users}x{csr.n_items}) to "
            f"({n_users}x{n_items})")
    if n_users == csr.n_users and n_items == csr.n_items:
        return csr
    indptr = np.concatenate([
        csr.indptr,
        np.full(n_users - csr.n_users, csr.indptr[-1],
                dtype=csr.indptr.dtype)])
    return CSRRatings(indptr=indptr, indices=csr.indices, data=csr.data,
                      n_users=n_users, n_items=n_items)


def csr_from_arrays(users: np.ndarray, items: np.ndarray, data: np.ndarray,
                    n_users: int, n_items: int,
                    use_native: bool = True) -> CSRRatings:
    """CSR from (possibly unsorted) triplets — sorts by (user, item).

    Uses the native parallel counting-sort builder when available (the
    np.lexsort path dominates host prep at Netflix scale: ~9 s for 20M
    rows vs <1 s native); falls back to NumPy."""
    if use_native and len(users) > 0:
        try:
            from cu2rec_tpu.data.native import native_csr_build
            indptr, s_items, s_data = native_csr_build(
                np.asarray(users), np.asarray(items), np.asarray(data),
                n_users)
            return CSRRatings(indptr=indptr, indices=s_items, data=s_data,
                              n_users=n_users, n_items=n_items)
        except Exception:
            pass
    order = np.lexsort((items, users))
    rd = RatingsData(users=users[order].astype(np.int32),
                     items=items[order].astype(np.int32),
                     ratings=data[order].astype(np.float32),
                     n_users=n_users, n_items=n_items,
                     global_bias=float(np.mean(data)) if len(data) else 0.0)
    return build_csr(rd, n_users, n_items)


@dataclass
class DeviceRatings:
    """Device-resident CSR ratings (jnp arrays; a pytree).

    The TPU-native analogue of ``CudaCSRMatrix`` (matrix.h:11-18): instead
    of raw cudaMalloc'd pointers, three jax arrays the jitted step closes
    over.  ``row_ids`` is the indptr expansion used by evaluation.

    ``pair_pack`` is a TPU-layout optimization for sampling: item ids and
    rating bits interleaved as int32 lanes ``[i0, r0, i1, r1, ...]`` in
    128-wide rows, so fetching a sampled (item, rating) pair is ONE
    lane-aligned row gather + two in-register lane selects instead of two
    element gathers (XLA TPU element gathers run ~element-at-a-time).

    ``it_indptr``/``it_pair_pack`` are the ITEM-major mirror (indptr over
    items; (user, rating) pairs interleaved), present only when built with
    ``item_major=True`` — the twin-sampling step samples one rater per
    item from them (see ops/packed.py, collision="twin").
    """

    indptr: object     # jnp (n_users+1,) int32
    indices: object    # jnp (nnz_padded,) int32
    data: object       # jnp (nnz_padded,) float32
    row_ids: object    # jnp (nnz_padded,) int32
    pair_pack: object  # jnp (nnz_padded/64, 128) int32, or None
    nnz: int           # true (unpadded) count
    n_users: int
    n_items: int
    it_indptr: object = None     # jnp (n_items+1,) int32, or None
    it_pair_pack: object = None  # jnp (nnz_padded/64, 128) int32, or None
    # Mirror-free twin alternative (``lean=True``): the item-major→flat
    # permutation (nnz_padded,) int32.  The twin step then fetches its
    # sampled (user, rating) through the ALREADY-RESIDENT row_ids/data
    # arrays (user = row_ids[it_order[pos]]), costing 4 bytes/rating of
    # HBM instead of it_pair_pack's 8 — and lean mode also drops the
    # user-side pair_pack (8 B/rating), sampling via indices/data
    # gathers.  Net: twin at Netflix scale drops from 28 to 16
    # bytes/rating, the headroom that lets F=300 fit (see ops/packed.py).
    it_order: object = None      # jnp (nnz_padded,) int32, or None
    # Max user-range width any EVAL_WINDOW_CHUNK-rating slice of row_ids
    # spans (0 = unknown).  Static metadata that lets eval dynamic-slice a
    # VMEM-sized window of the user table per chunk and gather locally at
    # the fast small-table rate (246 vs 82 M rows/s measured,
    # results/vmem-gather.jsonl) — see ops/loss.py.
    eval_span: int = 0


def transpose_order(csr: CSRRatings):
    """(it_indptr over items, item-major→flat permutation): the
    structural half of :func:`transpose_csr`, without materializing the
    permuted user/rating arrays (the lean twin path gathers through the
    permutation at step time instead)."""
    order = np.lexsort((csr.row_ids, csr.indices))
    items_sorted = csr.indices[order]
    counts = np.bincount(items_sorted, minlength=csr.n_items)
    it_indptr = np.zeros(csr.n_items + 1, dtype=np.int64)
    np.cumsum(counts, out=it_indptr[1:])
    return it_indptr, order


def transpose_csr(csr: CSRRatings):
    """Item-major view of the ratings: (it_indptr over items, user row_ids
    sorted by (item, user), ratings in the same order)."""
    it_indptr, order = transpose_order(csr)
    return it_indptr, csr.row_ids[order].astype(np.int32), csr.data[order]


def _interleave_pairs(ids: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """(id, rating-bits) interleaved into 128-lane rows for fetch_pairs."""
    pair = np.empty(2 * len(ids), dtype=np.int32)
    pair[0::2] = ids
    pair[1::2] = vals.view(np.int32)
    return pair.reshape(-1, 128)


def to_device(csr: CSRRatings, pad_multiple: int = 128, sharding=None,
              item_major: bool = False,
              pair_pack: bool = True,
              lean: bool = False) -> DeviceRatings:
    """Upload a host CSR to the device (the H→D boundary of matrix.cu:28-40).

    Padding rows carry user=0/item=0/rating=0 and are masked out by eval via
    the true ``nnz``.  The default ``pad_multiple=128`` keeps the flat
    arrays lane-aligned so ops can use the fast row-gather path
    (cu2rec_tpu.ops.sgd.gather_1d).

    ``item_major=True`` also uploads the transposed (item-major) sampling
    structure used by the twin-sampling step — +8 bytes/rating of HBM.

    ``pair_pack=False`` skips the interleaved sampling mirror (+8
    bytes/rating of HBM *and* upload time) for consumers that only
    evaluate or bucket-solve (ALS/iALS) and never sample — at 100M
    ratings over this environment's ~18 MB/s tunnel that mirror alone
    costs ~45 s of dead upload.

    ``lean=True`` is the HBM-constrained sampling layout: both
    interleaved mirrors are dropped (the step samples through
    indices/data/row_ids gathers; with ``item_major`` the item side goes
    through the ``it_order`` permutation).  16 bytes/rating instead of
    28 under twin — the layout that fits F=300 at Netflix scale — at the
    cost of 1-2 extra lane-aligned gathers per side per step.  Sampled
    streams are IDENTICAL to the mirrored layout (parity-tested).
    """
    import jax
    import jax.numpy as jnp

    nnz = csr.nnz
    pad_multiple = max(pad_multiple, 64)
    padded = -(-max(nnz, 1) // pad_multiple) * pad_multiple
    pad = padded - nnz
    indices = np.pad(csr.indices, (0, pad))
    data = np.pad(csr.data, (0, pad))
    # csr.row_ids is a rebuilt-per-access property; materialize once and
    # reuse for both the upload and the eval-span scan (at Netflix scale a
    # second access costs ~400 MB and a full 100M-element repeat pass).
    row_ids_host = csr.row_ids
    row_ids = np.pad(row_ids_host, (0, pad))
    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
        else jnp.asarray
    it_indptr = it_pair = it_order = None
    if item_major:
        if lean:
            ip_host, order = transpose_order(csr)
            it_indptr = jnp.asarray(ip_host.astype(np.int32))
            it_order = put(np.pad(order.astype(np.int32), (0, pad)))
        else:
            ip_host, it_users, it_vals = transpose_csr(csr)
            it_indptr = jnp.asarray(ip_host.astype(np.int32))
            it_pair = put(_interleave_pairs(np.pad(it_users, (0, pad)),
                                            np.pad(it_vals, (0, pad))))
    return DeviceRatings(
        indptr=jnp.asarray(csr.indptr),
        indices=put(indices),
        data=put(data),
        row_ids=put(row_ids),
        pair_pack=put(_interleave_pairs(indices, data))
        if pair_pack and not lean else None,
        nnz=nnz,
        n_users=csr.n_users,
        n_items=csr.n_items,
        it_indptr=it_indptr,
        it_pair_pack=it_pair,
        it_order=it_order,
        eval_span=eval_window_span(row_ids_host, nnz),
    )


import jax.tree_util as _jtu

_jtu.register_dataclass(
    DeviceRatings,
    data_fields=["indptr", "indices", "data", "row_ids", "pair_pack",
                 "it_indptr", "it_pair_pack", "it_order"],
    meta_fields=["nnz", "n_users", "n_items", "eval_span"],
)

# Scan-chunk size the windowed eval path uses; eval_span is computed for
# slices of this many ratings.
EVAL_WINDOW_CHUNK = 1 << 18


def eval_window_span(row_ids: np.ndarray, nnz: int,
                     chunk: int = EVAL_WINDOW_CHUNK) -> int:
    """Max row-range width any ``chunk``-rating slice spans (host-side).

    Requires ``row_ids[:nnz]`` non-decreasing (the CSR expansion is).
    Rounded up to a multiple of 8 for friendly tiling.
    """
    if nnz <= 0:
        return 0
    starts = np.arange(0, nnz, chunk)
    ends = np.minimum(starts + chunk, nnz) - 1
    span = int((row_ids[ends].astype(np.int64)
                - row_ids[starts].astype(np.int64)).max() + 1)
    return -(-span // 8) * 8
