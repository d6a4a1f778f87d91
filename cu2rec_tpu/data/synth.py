"""Planted-model synthetic ratings — scale/quality validation data.

This environment has no network access, so the reference benchmark grid's
real ML-20M / Netflix files (reference experiments/cu2rec.sh:8-10) cannot
be fetched.  Instead of opaque random stand-ins, ratings are drawn from a
PLANTED biased-MF model — exactly the model family the trainers fit
(reference util.cu:199-204):

    r(u,i) = mu + b*_u + b*_i + p*_u · q*_i + eps,   eps ~ N(0, noise)

so the Bayes-optimal test RMSE is known: it is exactly ``noise``.  A
training run's test-RMSE curve therefore measures *estimation error*
against an absolute floor, which no real dataset can provide.  Degrees
follow a power-law item popularity and lognormal user activity
(MovieLens/Netflix-like shapes).

``generate_planted`` returns raw (unsorted) triplets plus the planted
parameters and the floor; the ``cu2rec-synth`` CLI writes them as a
standard ratings CSV for the full preprocessing → train → serve journey.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PlantedData:
    users: np.ndarray      # (R,) int32, 0-based
    items: np.ndarray      # (R,) int32, 0-based
    ratings: np.ndarray    # (R,) float32
    noise_floor: float     # Bayes test RMSE (== noise unless clipped)
    mu: float
    P: np.ndarray          # planted (U, F)
    Q: np.ndarray          # planted (I, F)
    user_bias: np.ndarray
    item_bias: np.ndarray


def generate_planted(n_users: int, n_items: int, n_ratings: int,
                     n_factors: int = 20, noise: float = 0.30,
                     seed: int = 0, mu: float = 3.6,
                     signal_std: float = 0.5,
                     bias_std: tuple[float, float] = (0.35, 0.45),
                     item_power: float = 0.3,
                     user_sigma: float = 1.0,
                     clip: tuple[float, float] | None = None,
                     chunk: int = 1 << 24) -> PlantedData:
    """Draw ``n_ratings`` (user, item, rating) triplets from a planted
    biased-MF model.

    ``signal_std`` targets the std of the p·q interaction term; factor
    scale is (signal_std²/F)^(1/4) so Var[p·q] = F·s⁴ = signal_std².
    ``item_power`` is the ``rng.power`` shape for item popularity (0.3 ≈
    MovieLens-like head concentration); ``user_sigma`` the lognormal shape
    of user activity.  ``clip`` optionally censors ratings to a range —
    this raises the effective floor above ``noise``; left off by default
    so the floor stays exact.
    """
    rng = np.random.default_rng(seed)
    F = n_factors
    s = (signal_std ** 2 / F) ** 0.25
    P = rng.normal(0, s, (n_users, F)).astype(np.float32)
    Q = rng.normal(0, s, (n_items, F)).astype(np.float32)
    ub = rng.normal(0, bias_std[0], n_users).astype(np.float32)
    ib = rng.normal(0, bias_std[1], n_items).astype(np.float32)

    # Degree structure: lognormal user activity × power-law item popularity.
    w_u = rng.lognormal(0.0, user_sigma, n_users)
    cdf_u = np.cumsum(w_u / w_u.sum())
    users = np.searchsorted(cdf_u, rng.random(n_ratings)).astype(np.int32)
    users = np.minimum(users, n_users - 1)
    items = (n_items * rng.power(item_power, n_ratings)).astype(np.int32)
    items = np.minimum(items, n_items - 1)

    ratings = np.empty(n_ratings, dtype=np.float32)
    for lo in range(0, n_ratings, chunk):
        hi = min(lo + chunk, n_ratings)
        u, i = users[lo:hi], items[lo:hi]
        r = (mu + ub[u] + ib[i] + np.einsum("rf,rf->r", P[u], Q[i])
             + rng.normal(0, noise, hi - lo).astype(np.float32))
        ratings[lo:hi] = r
    floor = noise
    if clip is not None:
        ratings = np.clip(ratings, clip[0], clip[1])
        floor = float("nan")  # censoring makes the analytic floor invalid
    return PlantedData(users=users, items=items, ratings=ratings,
                       noise_floor=floor, mu=mu, P=P, Q=Q,
                       user_bias=ub, item_bias=ib)


def generate_planted_implicit(n_users: int, n_items: int, n_ratings: int,
                              n_factors: int = 20, seed: int = 0,
                              signal_std: float = 2.0,
                              bias_std: float = 0.45,
                              user_sigma: float = 1.0,
                              chunk_users: int = 2048,
                              oracle_samples: int = 200_000):
    """Implicit-feedback planted model: the signal is in WHICH pairs are
    observed, not in rating values.

    ``generate_planted`` draws (user, item) observations from degree
    distributions *independent* of the planted affinity, which is correct
    for explicit-rating regression (the value carries the signal) but
    leaves a ranking trainer like BPR (ops/bpr.py) nothing to learn beyond
    item popularity.  Here each user's observed items are drawn from a
    per-user softmax over the planted affinity

        a(u, i) = p*_u · q*_i + b*_i,      i ~ softmax_i a(u, ·)

    (the affinity plays the role of a log-popularity that is personalized
    per user), all observations have rating 1.0, and the attainable
    ceiling is the ORACLE AUC — P(a(u, i⁺) > a(u, j)) with i⁺ from the
    model and j uniform, scored by the planted parameters themselves —
    estimated by Monte Carlo and returned alongside the data.

    Returns ``(PlantedData, oracle_auc)``; repeated (u, i) draws are
    deduplicated, so ``len(data.users)`` can be below ``n_ratings`` —
    otherwise the duplicate pair would land in both sides of a later
    train/test split and deflate masked recall@k.  ``noise_floor`` is NaN
    (no rating noise), and the planted item popularity emerges from ``b*_i``
    plus the factor geometry rather than an explicit power law.
    """
    rng = np.random.default_rng(seed)
    F = n_factors
    s = (signal_std ** 2 / F) ** 0.25
    P = rng.normal(0, s, (n_users, F)).astype(np.float32)
    Q = rng.normal(0, s, (n_items, F)).astype(np.float32)
    ib = rng.normal(0, bias_std, n_items).astype(np.float32)

    w_u = rng.lognormal(0.0, user_sigma, n_users)
    counts = rng.multinomial(n_ratings, w_u / w_u.sum())
    users = np.repeat(np.arange(n_users, dtype=np.int32),
                      counts).astype(np.int32)

    items = np.empty(n_ratings, dtype=np.int32)
    oracle_hits = 0
    oracle_tot = 0
    per_chunk_oracle = max(1, oracle_samples // max(1, n_users // chunk_users))
    pos = 0
    for lo in range(0, n_users, chunk_users):
        hi = min(lo + chunk_users, n_users)
        c = hi - lo
        logits = P[lo:hi] @ Q.T + ib                       # (c, I)
        logits -= logits.max(axis=1, keepdims=True)
        np.exp(logits, out=logits)
        cdf = np.cumsum(logits, axis=1, dtype=np.float64)
        cdf /= cdf[:, -1:]
        n_chunk = int(counts[lo:hi].sum())
        # Vectorized per-row categorical sampling: offset each row's cdf
        # into its own unit interval, one flat searchsorted for all rows.
        flat_cdf = (cdf + np.arange(c, dtype=np.float64)[:, None]).ravel()
        rows = np.repeat(np.arange(c), counts[lo:hi])
        u01 = rng.random(n_chunk) + rows
        flat_pos = np.searchsorted(flat_cdf, u01)
        drawn = (flat_pos - rows.astype(np.int64) * n_items).astype(np.int32)
        # Clip BOTH ends: rng.random() == 0.0 lands side='left' searchsorted
        # on the previous row's final cdf entry (exactly == the row offset),
        # yielding drawn == -1; min-only clamping would write a -1 item id.
        items[pos:pos + n_chunk] = np.clip(drawn, 0, n_items - 1)
        pos += n_chunk
        # Oracle-AUC Monte Carlo on this chunk's users.
        m = min(per_chunk_oracle, c)
        sel = rng.integers(0, c, size=m)
        su = rng.random(m) + sel
        p_items = np.clip(
            (np.searchsorted(flat_cdf, su) - sel.astype(np.int64) * n_items),
            0, n_items - 1)
        n_items_draw = rng.integers(0, n_items, size=m)
        a = P[lo + sel]
        s_pos = np.einsum("mf,mf->m", a, Q[p_items]) + ib[p_items]
        s_neg = np.einsum("mf,mf->m", a, Q[n_items_draw]) + ib[n_items_draw]
        oracle_hits += int((s_pos > s_neg).sum())
        oracle_tot += m

    # Dedupe repeated (u, i) draws: sampling is with replacement and a
    # concentrated per-user softmax repeats head items often, so without
    # this the same pair lands in BOTH train and test after the split —
    # the train side then masks the test positive out of recommendations
    # and recall@k is systematically understated vs the oracle ceiling.
    # (The explicit generator needs no dedup: uniform-ish draws over
    # U×I cells make collisions ~0.3% at ML-20M shapes.)
    keys = users.astype(np.int64) * n_items + items
    _, first = np.unique(keys, return_index=True)
    first.sort()
    users, items = users[first], items[first]
    ratings = np.ones(len(users), dtype=np.float32)
    data = PlantedData(users=users, items=items, ratings=ratings,
                       noise_floor=float("nan"), mu=0.0, P=P, Q=Q,
                       user_bias=np.zeros(n_users, np.float32),
                       item_bias=ib)
    return data, oracle_hits / max(1, oracle_tot)


def write_planted_csv(data: PlantedData, path: str) -> None:
    """Write the triplets as a standard ratings CSV (1-based ids, header),
    via the native parallel writer when available."""
    try:
        from cu2rec_tpu.data.native import native_write_ratings
        native_write_ratings(path, data.users, data.items, data.ratings)
        return
    except Exception:
        pass
    with open(path, "w") as f:
        f.write("userId,itemId,rating\n")
        for u, i, r in zip(data.users, data.items, data.ratings):
            f.write(f"{u + 1},{i + 1},{r:.3f}\n")


def split_arrays(users: np.ndarray, items: np.ndarray, ratings: np.ndarray,
                 train_percent: float, seed: int = 42):
    """Vectorized global shuffle split + per-side user sort — the
    split_true protocol (reference split_to_test_train.py:39-49) at
    100M-row scale (the row-list implementation in data/split.py is the
    reference-shaped path; this one is numerically different only in
    which seeded permutation it draws).

    Returns ((users, items, ratings) train, (…) test), each sorted by
    (user, item) — the CSR builder's precondition."""
    rng = np.random.default_rng(seed)
    n = len(users)
    perm = rng.permutation(n)
    cut = int(n * train_percent)

    def side(sel):
        u, i, r = users[sel], items[sel], ratings[sel]
        order = np.lexsort((i, u))
        return u[order], i[order], r[order]

    return side(perm[:cut]), side(perm[cut:])
