"""Alternating Least Squares for biased MF — a second optimizer family.

The reference trains only by sampled SGD; ALS is the classic alternative
(and the industry-standard MF solver) and maps *beautifully* onto the MXU:
each half-sweep solves, for every user in parallel, the ridge system

    ( X_uᵀ X_u + diag(λ) ) θ_u = X_uᵀ y_u,      X_u = [ q_i | 1 ]_{i∈S_u}

for θ_u = [p_u, b_u] with the item side frozen (and symmetrically for
items).  Gram matrices are batched `einsum`s over degree-bucketed, padded
rating slices (power-law degrees → a few buckets bound padding waste),
and the solves are batched Cholesky factorizations — all dense MXU work,
no scatters at all.

Convergence: a handful of sweeps reaches the quality thousands of sampled
SGD iterations reach; each ML-20M half-sweep is ~2·R·F² ≈ 400 GFLOP.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cu2rec_tpu.data.csr import CSRRatings

# Degree-bucket capacities. A row with degree d lands in the smallest
# bucket with capacity >= d; rows beyond the largest capacity go to the
# HEAVY path: their slice is split into cap-sized segments whose partial
# Gram matrices are summed exactly (the Gram is a sum over ratings — no
# truncation; see _solve_heavy).
#
# ×2-spaced (r3): with the coarser ×4 ladder the padded-slot waste of a
# power-law side was 1.89× (every gather/X-stream/einsum pays it —
# results/als-decompose.jsonl); ×2 caps bound the within-bucket spread
# at 2× and the bucket width is further trimmed to the actual max
# degree (bucket_meta cap_eff).
BUCKET_CAPS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


@dataclass
class BucketedRows:
    """Padded per-row rating slices grouped by degree bucket (host side).

    Regular bucket: ``row_ids`` (B,), ``cols`` (B, D) padded counterpart
    ids, ``vals`` (B, D) ratings, ``mask`` (B, D).  The heavy bucket
    (rows with degree > caps[-1]) additionally carries the segment
    structure: rows (H,) with per-row segment ranges ``seg_start``/
    ``seg_end`` (H,) into the (S, D) segment axis, and true ``deg`` (H,).
    """

    buckets: list  # of dict(row_ids, cols, vals, mask [, seg_*, deg])
    n_rows: int


def bucket_meta(indptr: np.ndarray, caps=BUCKET_CAPS) -> list[dict]:
    """Bucket SELECTION metadata only — which rows land in which capacity
    bucket and which flat-CSR slice each padded row covers.  Touches only
    ``indptr`` (tiny), so the actual (cols, vals) extraction can happen
    either host-side (:func:`bucket_csr`) or on-device from the already
    uploaded CSR arrays (:func:`prepare_chunks_device`) without shipping a
    multi-GB bucket expansion over the host↔device link.

    Regular bucket dict: row_ids (B,), starts (B,), lens (B,), cap.
    Heavy bucket adds seg_start/seg_end (H,) into its segment axis and the
    true deg (H,); its starts/lens are per-SEGMENT.
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    deg = np.diff(indptr)
    metas = []
    for bi, cap in enumerate(caps):
        lo = caps[bi - 1] if bi else 0
        sel = np.nonzero((deg > lo) & (deg <= cap))[0]
        if len(sel) == 0:
            continue
        # Trim the padded width to the bucket's ACTUAL max degree
        # (8-aligned): with the static cap, a bucket whose members
        # cluster near its lower edge pads every row to the top —
        # measured 3.35x padded-slot waste on the uniform-degree user
        # side at ML-20M (results/als-decompose.jsonl), multiplying the
        # gather + X-stream + einsum costs that dominate the sweep.
        cap_eff = min(cap, int(-(-int(deg[sel].max()) // 8) * 8))
        metas.append(dict(row_ids=sel.astype(np.int32), starts=indptr[sel],
                          lens=deg[sel], cap=cap_eff))
    cap = caps[-1]
    sel = np.nonzero(deg > cap)[0]
    if len(sel):
        d = deg[sel]
        nseg = -(-d // cap)
        seg_end = np.cumsum(nseg)
        seg_start = seg_end - nseg
        owner = np.repeat(np.arange(len(sel)), nseg)          # (S,)
        segidx = np.arange(seg_end[-1]) - seg_start[owner]    # j within row
        sstarts = indptr[sel][owner] + segidx * cap
        slens = np.minimum(indptr[sel + 1][owner] - sstarts, cap)
        metas.append(dict(row_ids=sel.astype(np.int32), starts=sstarts,
                          lens=slens, cap=cap,
                          seg_start=seg_start.astype(np.int32),
                          seg_end=seg_end.astype(np.int32),
                          deg=d.astype(np.float32)))
    return metas


def bucket_csr(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
               caps=BUCKET_CAPS) -> BucketedRows:
    n_rows = len(indptr) - 1
    nnz = len(indices)

    def extract(starts, lens, cap):
        """Vectorized padded-slice extraction (no per-row Python loop)."""
        j = np.arange(cap, dtype=np.int64)[None, :]
        mask = j < lens[:, None]
        pos = np.clip(starts[:, None] + j, 0, max(nnz - 1, 0))
        cols = np.where(mask, indices[pos], 0).astype(np.int32)
        vals = np.where(mask, data[pos], 0).astype(np.float32)
        return cols, vals, mask

    buckets = []
    for m in bucket_meta(indptr, caps):
        cols, vals, mask = extract(m["starts"], m["lens"], m["cap"])
        b = {"row_ids": m["row_ids"], "cols": cols, "vals": vals,
             "mask": mask}
        if "seg_start" in m:
            b.update(seg_start=m["seg_start"], seg_end=m["seg_end"],
                     deg=m["deg"])
        buckets.append(b)
    return BucketedRows(buckets=buckets, n_rows=n_rows)


from cu2rec_tpu.data.csr import transpose_csr  # noqa: F401  (shared impl)


def _heavy_groups(seg_start, seg_end, chunk: int):
    """Group heavy rows into chunks of ≤``chunk`` segments, whole rows
    only (a row's segment range must stay inside one chunk so the
    cumsum-difference Gram assembly in _solve_heavy sees all of it).

    Shared by prepare_chunks and prepare_chunks_device so the two paths
    can never diverge in grouping.  Returns (groups [(lo, hi) row
    ranges], H_pad — the common padded row count, chunk — raised to the
    largest single row's segment count if needed)."""
    H = len(seg_start)
    chunk = max(chunk, int((seg_end - seg_start).max()))
    groups = []
    lo = 0
    while lo < H:
        hi = lo
        while hi < H and seg_end[hi] - seg_start[lo] <= chunk:
            hi += 1
        hi = max(hi, lo + 1)
        groups.append((lo, hi))
        lo = hi
    H_pad = max(hi - lo for lo, hi in groups)
    return groups, H_pad, chunk


def _chunk_size(B: int, width: int, F1: int, budget: int,
                row_sharding, heavy: bool) -> int:
    """Rows per chunk bounding the (chunk, width, F1) design tensor to
    ~``budget`` elements; non-heavy chunks are aligned to the mesh size
    so sharded placement splits them evenly (heavy chunks are never
    sharded — both prepare paths keep them replicated)."""
    chunk = max(1, min(B, budget // max(width * F1, 1)))
    if row_sharding is not None and not heavy:
        n_dev = _spec_devices(row_sharding)
        chunk = max(n_dev, (chunk // n_dev) * n_dev)
    return chunk


def _chunk_budget(default: int = 64 << 20) -> int:
    """Elements per chunk design tensor.  CU2REC_ALS_BUDGET (elements)
    overrides — an operational knob: smaller chunks mean more, smaller
    per-chunk programs, which keeps a memory-limited remote compile
    helper from SIGKILLing the tier-3 compiles (observed r4)."""
    import os
    v = os.environ.get("CU2REC_ALS_BUDGET")
    return int(v) if v else default


def _spec_devices(row_sharding) -> int:
    """Device count the row dimension splits over — spec[0] may be one
    mesh axis name or a tuple of axes (full-mesh dp×ip sharding)."""
    axes = row_sharding.spec[0]
    if isinstance(axes, str):
        axes = (axes,)
    n = 1
    for a in axes:
        n *= row_sharding.mesh.shape[a]
    return n


def prepare_chunks(bucketed: BucketedRows, n_factors: int,
                   n_rows_total: int, row_sharding=None,
                   budget: int | None = None):
    """Pre-upload bucket data as fixed-shape device chunks (done ONCE per
    training run — re-uploading per sweep dominated sweep time through
    slow H2D links).

    Chunking bounds the materialized (chunk, D, F+1) design matrix to
    ~``budget`` elements; tail chunks are padded to the common shape so
    each bucket compiles a single solve program, with padding rows given
    out-of-bounds row ids (scattered with mode='drop').
    """
    budget = budget or _chunk_budget()
    F1 = n_factors + 1
    chunks = []
    for b in bucketed.buckets:
        B, D = b["cols"].shape
        chunk = _chunk_size(B, D, F1, budget, row_sharding,
                            heavy="seg_start" in b)

        def pad_chunk(x, s, e, fill=0, sharded=True, width=chunk):
            out = x[s:e]
            if e - s < width:
                pad = [(0, width - (e - s))] + [(0, 0)] * (x.ndim - 1)
                out = np.pad(out, pad, constant_values=fill)
            if sharded and row_sharding is not None:
                return jax.device_put(out, row_sharding)
            return jnp.asarray(out)

        if "seg_start" not in b:
            for s in range(0, B, chunk):
                e = min(s + chunk, B)
                chunks.append(("reg",
                               pad_chunk(b["cols"], s, e),
                               pad_chunk(b["vals"], s, e),
                               pad_chunk(b["mask"], s, e, fill=False),
                               pad_chunk(b["row_ids"], s, e,
                                         fill=n_rows_total)))
            continue

        # Heavy bucket: B here counts segments.
        seg_start, seg_end = b["seg_start"], b["seg_end"]
        # NOTE: pad_chunk's ``width=chunk`` default was captured at def
        # time above; after this rebind every heavy-path call must pass
        # ``width=`` explicitly or groups sized between the old and new
        # chunk would keep heterogeneous shapes (one recompile per shape).
        groups, H_pad, chunk = _heavy_groups(seg_start, seg_end, chunk)
        for lo, hi in groups:
            s0, s1 = int(seg_start[lo]), int(seg_end[hi - 1])
            chunks.append((
                "heavy",
                pad_chunk(b["cols"], s0, s1, sharded=False, width=chunk),
                pad_chunk(b["vals"], s0, s1, sharded=False, width=chunk),
                pad_chunk(b["mask"], s0, s1, fill=False, sharded=False,
                          width=chunk),
                pad_chunk(b["row_ids"], lo, hi, fill=n_rows_total,
                          sharded=False, width=H_pad),
                pad_chunk(seg_start - s0, lo, hi, fill=0, sharded=False,
                          width=H_pad),
                pad_chunk(seg_end - s0, lo, hi, fill=0, sharded=False,
                          width=H_pad),
                pad_chunk(b["deg"], lo, hi, fill=1.0, sharded=False,
                          width=H_pad),
            ))
    return chunks


@partial(jax.jit, static_argnames=("cap",))
def _extract_rows_device(flat_i, flat_d, starts, lens, cap: int):
    """Padded-slice extraction ON DEVICE: (B, cap) cols/vals/mask from the
    flat CSR arrays via per-row contiguous dynamic slices.  ``flat_*``
    must be padded by ≥cap so no slice clamps."""

    def one(s):
        return (jax.lax.dynamic_slice(flat_i, (s,), (cap,)),
                jax.lax.dynamic_slice(flat_d, (s,), (cap,)))

    cols, vals = jax.vmap(one)(starts)
    mask = jnp.arange(cap, dtype=jnp.int32)[None, :] < lens[:, None]
    return (jnp.where(mask, cols, 0), jnp.where(mask, vals, 0.0), mask)


def prepare_chunks_device(indices_dev, data_dev, indptr_host, n_factors: int,
                          n_rows_total: int, nnz: int, caps=BUCKET_CAPS,
                          budget: int | None = None, row_sharding=None):
    """Device-side bucket build: same chunk contract as
    :func:`prepare_chunks`, but (cols, vals) are EXTRACTED ON DEVICE from
    the already-uploaded flat CSR arrays — only tiny (starts, lens)
    vectors cross the host↔device boundary, instead of the multi-GB
    padded bucket expansion (which made Netflix-scale ALS impractical
    through slow host links; docs/ROADMAP.md r1 known limits)."""
    from cu2rec_tpu.utils.watchdog import stall_watchdog
    budget = budget or _chunk_budget()
    F1 = n_factors + 1
    cap_max = caps[-1]
    flat_i = jnp.pad(jnp.asarray(indices_dev[:nnz], jnp.int32), (0, cap_max))
    flat_d = jnp.pad(jnp.asarray(data_dev[:nnz], jnp.float32), (0, cap_max))

    def put(x):
        if row_sharding is not None:
            return jax.device_put(x, row_sharding)
        return x

    chunks = []
    for m in bucket_meta(indptr_host, caps):
        cap = int(m["cap"])
        B = len(m["starts"])
        heavy = "seg_start" in m
        chunk = _chunk_size(B, cap, F1, budget, row_sharding, heavy)

        def padded(x, s, e, fill=0, width=None):
            width = chunk if width is None else width
            out = np.asarray(x[s:e])
            if e - s < width:
                out = np.pad(out, (0, width - (e - s)),
                             constant_values=fill)
            return out

        if not heavy:
            for s in range(0, B, chunk):
                e = min(s + chunk, B)
                starts = jnp.asarray(padded(m["starts"], s, e),
                                     jnp.int32)
                lens = jnp.asarray(padded(m["lens"], s, e), jnp.int32)
                with stall_watchdog(
                        f"device bucket extraction (cap={cap})"):
                    cols, vals, mask = _extract_rows_device(
                        flat_i, flat_d, starts, lens, cap)
                # row_ids placed like cols/vals/mask (the host path shards
                # them too): a replicated scatter index against sharded
                # theta would force a per-chunk reshard every sweep.
                chunks.append(("reg", put(cols), put(vals), put(mask),
                               put(jnp.asarray(padded(m["row_ids"], s, e,
                                                      fill=n_rows_total),
                                               jnp.int32))))
            continue

        seg_start, seg_end = m["seg_start"], m["seg_end"]
        groups, H_pad, chunk = _heavy_groups(seg_start, seg_end, chunk)
        for lo, hi in groups:
            s0, s1 = int(seg_start[lo]), int(seg_end[hi - 1])
            starts = jnp.asarray(padded(m["starts"], s0, s1), jnp.int32)
            lens = jnp.asarray(padded(m["lens"], s0, s1), jnp.int32)
            with stall_watchdog(
                    f"device bucket extraction (heavy, cap={cap})"):
                cols, vals, mask = _extract_rows_device(
                    flat_i, flat_d, starts, lens, cap)
            chunks.append((
                "heavy", cols, vals, mask,
                jnp.asarray(padded(m["row_ids"], lo, hi,
                                   fill=n_rows_total, width=H_pad),
                            jnp.int32),
                jnp.asarray(padded(seg_start - s0, lo, hi, width=H_pad),
                            jnp.int32),
                jnp.asarray(padded(seg_end - s0, lo, hi, width=H_pad),
                            jnp.int32),
                jnp.asarray(padded(m["deg"], lo, hi, fill=1.0,
                                   width=H_pad), jnp.float32),
            ))
    return chunks


def als_half_sweep(T_self, T_other, bucketed, mu,
                   factor_reg: float, bias_reg: float, n_factors: int,
                   weight_by_degree: bool = True, row_sharding=None,
                   solver: str = "auto", fused: bool = True):
    """Update every row of ``T_self`` given frozen ``T_other``.

    ``bucketed`` may be a host-side :class:`BucketedRows` (chunks prepared
    and uploaded on the fly) or a pre-prepared chunk list from
    :func:`prepare_chunks` (preferred — upload once, sweep many).

    With ``weight_by_degree`` the ridge term is scaled by each row's
    degree (λ·|S|, the Zhou et al. weighted-λ regularization — the ALS
    analogue of the SGD reg being applied once per sampled update).

    ``fused`` runs all chunk solves in ONE jitted program per half-sweep
    instead of one dispatch per chunk (~14 chunks × ~7 ms dispatch
    latency through this environment's tunneled runtime added ~0.2 s to
    every ML-20M sweep; it also lets XLA overlap chunk work).
    """
    F = n_factors
    reg = jnp.concatenate([jnp.full((F,), factor_reg, jnp.float32),
                           jnp.full((1,), bias_reg, jnp.float32)])
    if isinstance(bucketed, BucketedRows):
        chunks = prepare_chunks(bucketed, F, T_self.shape[0], row_sharding)
    else:
        chunks = bucketed
    regs = tuple(ch[1:] for ch in chunks if ch[0] == "reg")
    heavies = tuple(ch[1:] for ch in chunks if ch[0] == "heavy")
    if len(regs) + len(heavies) != len(chunks):
        # Explicit raise (not assert): under python -O a silently dropped
        # chunk means those rows' solves never run — quiet model damage.
        raise ValueError(
            "unknown chunk tag(s): "
            f"{sorted({ch[0] for ch in chunks} - {'reg', 'heavy'})}")
    mu32 = jnp.float32(mu)

    def eager_fn(T, regs_g, heavies_g):
        # Block after every chunk: eager dispatch is async, and each
        # chunk's _scatter_theta materializes a FRESH full table — at
        # Netflix F=300 (584 MB user table) letting ~20 chunk updates
        # queue up keeps ~20 live table copies and OOMs the 16 GB HBM
        # (measured r5: RESOURCE_EXHAUSTED on the first post-sweep
        # fetch).  The block bounds liveness to ~2 copies; the ~7 ms
        # dispatch latency per chunk is noise on this fallback path
        # (the fused tiers keep the async overlap).
        for ch in regs_g:
            T = jax.block_until_ready(
                _als_apply_reg(T, T_other, ch, mu32, reg, F,
                               weight_by_degree, solver))
        for ch in heavies_g:
            T = jax.block_until_ready(
                _als_apply_heavy(T, T_other, ch, mu32, reg, F,
                                 weight_by_degree, solver))
        return T

    if not fused:
        return eager_fn(T_self, regs, heavies)

    def fused_fn(T, regs_g, heavies_g):
        return _als_half_sweep_fused(
            T, T_other, regs_g, heavies_g, mu32, reg, n_factors=F,
            weight_by_degree=weight_by_degree, solver=solver)

    return fused_dispatch(("als", solver, weight_by_degree), T_self,
                          fused_fn, eager_fn, regs, heavies)


# Program signatures whose fused compile/first-execution failed, keyed by
# (algo tag, tier, chunk shapes) — NOT a process-global boolean: one failed
# Netflix-scale compile must not strip same-process ML-20M sweeps of their
# measured 34% fusion win (round-2 verdict item 6).  ALS and iALS share the
# set (same program-shape hazard, distinct tags).
_FUSED_DISABLED: set = set()

# Chunks per program in the middle tier: small enough that Netflix-scale
# programs that OOMed the compiler whole (observed: remote compile helper
# SIGKILLed at ~14 chunks) compile in pieces, large enough to amortize the
# ~7 ms tunneled dispatch latency per program.
_FUSED_GROUP_K = 4


def _eager_retry(eager_fn, T, regs_g, heavies_g, tries: int = 3,
                 backoff: float = 20.0):
    """Tier 3 (per-chunk) has no lower tier, so a TRANSIENT remote-compile
    failure — the tunneled compile helper getting SIGKILLed under memory
    pressure, observed killing per-chunk programs in r4 — would abort a
    whole training journey.  The per-chunk computation is pure and
    idempotent: retry it a couple of times with backoff before giving up.
    Non-compile-service errors re-raise immediately."""
    import time as _time

    from cu2rec_tpu.utils.watchdog import stall_watchdog
    for attempt in range(tries):
        try:
            with stall_watchdog("per-chunk compile/dispatch"):
                return eager_fn(T, regs_g, heavies_g)
        except jax.errors.JaxRuntimeError as e:
            if attempt + 1 >= tries or "remote_compile" not in str(e):
                raise
            import warnings
            warnings.warn(
                f"per-chunk program compile failed transiently "
                f"(retry {attempt + 1}/{tries - 1} in {backoff:.0f}s): "
                f"{str(e)[:150]}")
            _time.sleep(backoff)


def fused_dispatch(tag, T_self, fused_fn, eager_fn, regs, heavies,
                   group_k: int | None = None):
    """Three-tier fused chunk dispatch with per-signature sticky disables.

    Tier 1 runs ALL chunks in one jitted program (best: one dispatch, XLA
    overlaps chunk work).  If that program's compile or first execution
    fails (compiler OOM at Netflix scale), its signature is disabled and
    tier 2 re-runs the sweep as groups of ``group_k`` chunks per program —
    partial fusion that large sweeps survive.  A group that also fails is
    disabled by its own signature and computed per-chunk (tier 3,
    ``eager_fn``).  Signatures include chunk shapes/dtypes, so a failure
    at one scale never affects sweeps at another scale in the same
    process.

    ``fused_fn(T, regs, heavies)`` / ``eager_fn(T, regs, heavies)`` must
    compute identical results (parity-tested); both close over the frozen
    other-side table.
    """
    import os
    if os.environ.get("CU2REC_NO_FUSED"):
        # Operational escape hatch: some (data-dependent) chunk sets wedge
        # the remote compile helper for an hour+ even at the group tier;
        # the per-chunk path computes identical results from a handful of
        # small fast-compiling programs.
        return _eager_retry(eager_fn, T_self, regs, heavies)
    if group_k is None:
        group_k = _FUSED_GROUP_K
    from cu2rec_tpu.utils.watchdog import stall_watchdog
    full_sig = (tag, _chunks_sig(regs), _chunks_sig(heavies))
    if not _sig_disabled(full_sig):
        try:
            # A degraded remote compile helper can HANG (never answer)
            # instead of erroring — this ladder only catches the raise,
            # so the watchdog is the operator's signal that the compile
            # RPC is wedged, not slow (measured repeatedly this round).
            with stall_watchdog(f"{tag} full-fused compile/dispatch"):
                out = fused_fn(T_self, regs, heavies)
                _check_fused_runtime(out, full_sig)
            return out
        except jax.errors.JaxRuntimeError as e:
            _disable_fused(full_sig, e, tier="full")
    groups = [(regs[i:i + group_k], ())
              for i in range(0, len(regs), group_k)]
    groups += [((), heavies[i:i + group_k])
               for i in range(0, len(heavies), group_k)]
    T = T_self
    for regs_g, heavies_g in groups:
        gsig = (tag, "group", _chunks_sig(regs_g), _chunks_sig(heavies_g))
        if _sig_disabled(gsig):
            T = _eager_retry(eager_fn, T, regs_g, heavies_g)
            continue
        try:
            with stall_watchdog(f"{tag} group-fused compile/dispatch"):
                out = fused_fn(T, regs_g, heavies_g)
                _check_fused_runtime(out, gsig)
            T = out
        except jax.errors.JaxRuntimeError as e:
            _disable_fused(gsig, e, tier="group")
            T = _eager_retry(eager_fn, T, regs_g, heavies_g)
    return T

# Program signatures whose fused executable has completed one real
# execution (algo tag + solver + per-chunk shapes + output aval — i.e. the
# jit cache key modulo values, so two distinct executables never alias).
_FUSED_VERIFIED: set = set()


def _chunks_sig(chunks) -> tuple:
    """Shape/dtype signature of a prepared chunk tuple — distinguishes
    fused executables that share an output aval but differ in chunking."""
    return tuple(
        tuple((tuple(a.shape), str(a.dtype)) if hasattr(a, "shape")
              else a for a in ch)
        for ch in chunks)


def _check_fused_runtime(out, sig) -> None:
    """Block on the FIRST fused execution per program signature.

    JAX dispatch is async: a fused program can compile fine but fail at
    execution (e.g. runtime HBM OOM at a new padding size), and without
    this the error would surface at some later blocking use — outside
    the caller's try, skipping the per-chunk fallback and killing the
    run.  Runtime failures are shape-dependent, so verifying the first
    execution per program signature keeps every subsequent call fully
    async.  Uses a dependent device→host fetch, not block_until_ready:
    on this platform's tunneled runtime block_until_ready can return
    before the program actually finishes (see utils/timing).
    """
    key = (sig, out.shape, str(out.dtype))
    if key not in _FUSED_VERIFIED:
        from cu2rec_tpu.utils.timing import fetch_barrier
        fetch_barrier(out)
        _FUSED_VERIFIED.add(key)


def _disabled_store_path():
    """Path of the persisted disabled-signature list, or None when
    persistent caching is off (tests; CU2REC_NO_COMPILE_CACHE).  The XLA
    compile cache only remembers SUCCESSFUL compiles — without this
    store every fresh process re-pays a doomed multi-minute fused
    compile (observed: ~5 min of remote-compile SIGKILL per run of the
    ML-20M iALS journey) before falling to the group tier."""
    import os

    if os.environ.get("CU2REC_NO_FUSED_PERSIST"):
        return None
    from cu2rec_tpu.utils.cache import persist_dir
    d = persist_dir()
    return os.path.join(d, "fused_disabled.json") if d else None


def _read_disabled_store(path: str) -> set:
    import json
    import os
    if not os.path.exists(path):
        return set()
    try:
        with open(path) as f:
            return set(json.load(f))
    except (OSError, ValueError):
        return set()


def _persisted_disabled() -> set:
    """The persisted disabled-signature set for the CURRENT store path.

    Keyed by path (not loaded-once): enable_compile_cache() can turn
    persistence on AFTER a first _sig_disabled call — a load-once cache
    pinned to the early None path would shadow (and, on the next write,
    clobber) signatures persisted by earlier runs."""
    global _FUSED_DISABLED_PERSISTED
    path = _disabled_store_path()
    if path is None:
        return set()
    if _FUSED_DISABLED_PERSISTED is None or \
            _FUSED_DISABLED_PERSISTED[0] != path:
        _FUSED_DISABLED_PERSISTED = (path, _read_disabled_store(path))
    return _FUSED_DISABLED_PERSISTED[1]


def _sig_disabled(sig) -> bool:
    if sig in _FUSED_DISABLED:
        return True
    return repr(sig) in _persisted_disabled()


# (path, repr-string set) mirror of _FUSED_DISABLED persisted across
# processes; None until the store is first read, re-read when the store
# path changes (see _persisted_disabled).
_FUSED_DISABLED_PERSISTED = None


def _disable_fused(sig, exc: Exception, tier: str = "full") -> None:
    _FUSED_DISABLED.add(sig)
    path = _disabled_store_path()
    if path:  # persistence enabled (CLIs/harnesses; never in tests)
        entries = _persisted_disabled()
        entries.add(repr(sig))
        import json
        import os
        import time as _time
        # Read-merge-write under a best-effort O_EXCL lock: without it
        # two concurrent writers can each re-read BEFORE the other's
        # rename and the last rename drops the other's signature
        # (TOCTOU).  The lock is advisory — after ~2 s of contention
        # (or a stale lock from a crashed process, detected by age) we
        # proceed unlocked, degrading to the previous
        # merge-what-landed-so-far behavior rather than blocking a
        # training loop on serving-cache bookkeeping.
        lock = f"{path}.lock"
        fd = -1
        for _ in range(20):
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                try:
                    if _time.time() - os.path.getmtime(lock) > 10:
                        os.unlink(lock)
                        continue
                except OSError:
                    pass
                _time.sleep(0.1)
            except OSError:
                break
        try:
            entries |= _read_disabled_store(path)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(sorted(entries), f)
            os.replace(tmp, path)
        except OSError:
            pass
        finally:
            if fd >= 0:
                os.close(fd)
                try:
                    os.unlink(lock)
                except OSError:
                    pass
    import warnings
    nxt = ("retrying as group-fused programs" if tier == "full"
           else "computing this group per-chunk")
    warnings.warn(
        f"{tier}-fused half-sweep failed for one program signature; "
        f"{nxt} (other signatures unaffected): {str(exc)[:200]}")


def _scatter_theta(T_new, theta, rows, F: int):
    """Write solved [p | b] rows back into the packed table (padding rows
    carry out-of-bounds ids → mode='drop')."""
    W = T_new.shape[1]
    rowvec = jnp.zeros((theta.shape[0], W), dtype=T_new.dtype)
    rowvec = rowvec.at[:, :F].set(theta[:, :F].astype(T_new.dtype))
    rowvec = rowvec.at[:, F].set(theta[:, F].astype(T_new.dtype))
    return T_new.at[rows].set(rowvec, mode="drop")


def _als_apply_reg(T_new, T_other, ch, mu, reg, F, weight_by_degree,
                   solver):
    cols, vals, mask, rows = ch
    if weight_by_degree:
        deg = mask.sum(axis=1).astype(jnp.float32)[:, None]
    else:
        deg = jnp.ones((cols.shape[0], 1), dtype=jnp.float32)
    theta = _solve_bucket_weighted(T_other, cols, vals, mask, mu,
                                   reg, deg, solver=solver)
    return _scatter_theta(T_new, theta, rows, F)


def _als_apply_heavy(T_new, T_other, ch, mu, reg, F, weight_by_degree,
                     solver):
    cols, vals, mask, rows, s0, s1, degv = ch
    if not weight_by_degree:
        degv = jnp.ones_like(degv)
    theta = _solve_heavy(T_other, cols, vals, mask, mu, reg,
                         s0, s1, degv, solver=solver)
    return _scatter_theta(T_new, theta, rows, F)


@partial(jax.jit,
         static_argnames=("n_factors", "weight_by_degree", "solver"))
def _als_half_sweep_fused(T_self, T_other, regs, heavies, mu, reg, *,
                          n_factors: int, weight_by_degree: bool,
                          solver: str):
    # Chunks are independent reads of T_other, so without a barrier XLA
    # hoists every chunk's (rows × max_deg, W) gather to the program
    # start — ~14 live 0.3 GB temporaries OOMed a 16 GB chip (measured:
    # "Used 41.96G of 15.75G hbm"). Chaining each chunk's T_other read
    # on the previous chunk's T_new serializes them: peak HBM = tables
    # + ONE chunk's temps, same as the per-dispatch path.
    T_new = T_self
    for ch in regs:
        T_dep, T_new = jax.lax.optimization_barrier((T_other, T_new))
        T_new = _als_apply_reg(T_new, T_dep, ch, mu, reg, n_factors,
                               weight_by_degree, solver)
    for ch in heavies:
        T_dep, T_new = jax.lax.optimization_barrier((T_other, T_new))
        T_new = _als_apply_heavy(T_new, T_dep, ch, mu, reg, n_factors,
                                 weight_by_degree, solver)
    return T_new


@partial(jax.jit, static_argnames=("solver",))
def _solve_bucket_weighted(T_other, cols, vals, mask, mu, reg_vec, deg,
                           solver: str = "auto"):
    F1 = reg_vec.shape[0]
    F = F1 - 1
    other = T_other[cols]
    q = other[..., :F].astype(jnp.float32)
    b_other = other[..., F].astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]
    X = jnp.concatenate([q, jnp.ones_like(b_other)[..., None]], axis=-1) * m
    y = (vals - mu - b_other) * mask
    G = jnp.einsum("bdf,bdg->bfg", X, X,
                   preferred_element_type=jnp.float32)
    lam = reg_vec[None, None, :] * jnp.maximum(deg, 1.0)[..., None]
    G = G + jnp.eye(F1)[None] * lam
    rhs = jnp.einsum("bdf,bd->bf", X, y,
                     preferred_element_type=jnp.float32)
    return _ridge_finish(G, rhs, solver)


def _ridge_finish(G, rhs, solver: str):
    if solver == "auto":
        # Measured (results/solve-bench.jsonl, v5e): the Pallas
        # VMEM-resident solver is 3.5x (N=51) / 10.1x (N=101) the
        # blocked path on TPU; in interpret mode on CPU it is pure
        # overhead, so auto picks blocked there.
        solver = "pallas" if jax.default_backend() == "tpu" else "blocked"
    if solver == "blocked":
        # batch-vectorized blocked Cholesky (ops/batched_linalg) — 4.4x
        # the XLA custom-call path for many small systems on TPU
        from cu2rec_tpu.ops.batched_linalg import ridge_solve_batched
        return ridge_solve_batched(G, rhs)
    if solver == "pallas":
        # VMEM-resident lane-batched Cholesky (ops/pallas_linalg):
        # HBM reads G exactly once per solve instead of once per panel
        # step of the blocked path.
        from cu2rec_tpu.ops.pallas_linalg import ridge_solve_batched_pallas
        return ridge_solve_batched_pallas(
            G, rhs, interpret=jax.default_backend() == "cpu")
    chol = jnp.linalg.cholesky(G)
    z = jax.scipy.linalg.solve_triangular(chol, rhs[..., None], lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), z, lower=False)[..., 0]


@partial(jax.jit, static_argnames=("solver",))
def _solve_heavy(T_other, cols, vals, mask, mu, reg_vec, seg_start, seg_end,
                 deg, solver: str = "auto"):
    """Exact ridge solve for ultra-heavy rows (degree > caps[-1]).

    The row's slice arrives split into cap-sized segments (S, D); the Gram
    matrix is a SUM over ratings, so per-segment partial Grams are
    accumulated exactly via an exclusive cumulative sum and a
    difference-of-prefixes gather per row — no truncation of hot rows
    (Netflix hot items have degree ~2×10⁵; the former 8192-entry cap
    silently solved them on <4% of their data)."""
    F1 = reg_vec.shape[0]
    F = F1 - 1
    other = T_other[cols]
    q = other[..., :F].astype(jnp.float32)
    b_other = other[..., F].astype(jnp.float32)
    m = mask.astype(jnp.float32)[..., None]
    X = jnp.concatenate([q, jnp.ones_like(b_other)[..., None]], axis=-1) * m
    y = (vals - mu - b_other) * mask
    Gseg = jnp.einsum("sdf,sdg->sfg", X, X,
                      preferred_element_type=jnp.float32)
    rseg = jnp.einsum("sdf,sd->sf", X, y,
                      preferred_element_type=jnp.float32)
    Gz = jnp.concatenate([jnp.zeros((1, F1, F1), jnp.float32),
                          jnp.cumsum(Gseg, axis=0)], axis=0)
    rz = jnp.concatenate([jnp.zeros((1, F1), jnp.float32),
                          jnp.cumsum(rseg, axis=0)], axis=0)
    G = Gz[seg_end] - Gz[seg_start]                       # (H, F1, F1)
    rhs = rz[seg_end] - rz[seg_start]                     # (H, F1)
    lam = reg_vec[None, None, :] * jnp.maximum(deg, 1.0)[:, None, None]
    G = G + jnp.eye(F1)[None] * lam
    return _ridge_finish(G, rhs, solver)
