#!/usr/bin/env python
"""External-library CPU comparison baseline (reference
experiments/run_surprise.py + surprise.sh).

The reference compared cu2rec against scikit-surprise's SVD on CPU,
converting cu2rec "iterations" (one sampled update per user per iteration)
to surprise epochs via  epochs = ceil(users * iterations / ratings)
(run_surprise.py:20-23).  Same protocol here.  scikit-surprise is not a
core dependency — if it's unavailable this script falls back to a
PyTorch-CPU SGD-SVD implementing the same training budget, so the sanity
baseline always runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import math
import time

import numpy as np


def load(ratings_csv: str):
    from cu2rec_tpu.data import build_csr, read_ratings_csv
    rd = read_ratings_csv(ratings_csv)
    return rd, build_csr(rd)


def epochs_for(n_users: int, iterations: int, n_ratings: int) -> int:
    # reference run_surprise.py:20-23
    return max(1, math.ceil(n_users * iterations / n_ratings))


def run_surprise(train_csv: str, test_csv: str, iterations: int,
                 factors: int):
    from surprise import SVD, Dataset, Reader, accuracy
    import pandas as pd

    train = pd.read_csv(train_csv)
    test = pd.read_csv(test_csv)
    n_users = train["userId"].nunique()
    epochs = epochs_for(n_users, iterations, len(train))
    reader = Reader(rating_scale=(train["rating"].min(),
                                  train["rating"].max()))
    data = Dataset.load_from_df(train[["userId", "itemId", "rating"]],
                                reader)
    trainset = data.build_full_trainset()
    algo = SVD(n_factors=factors, n_epochs=epochs)
    t0 = time.perf_counter()
    algo.fit(trainset)
    wall = time.perf_counter() - t0
    testset = list(test[["userId", "itemId", "rating"]].itertuples(
        index=False, name=None))
    rmse = accuracy.rmse(algo.test(testset), verbose=False)
    return {"library": "surprise", "epochs": epochs, "wall_s": wall,
            "test_rmse": rmse}


def run_torch(train_csv: str, test_csv: str, iterations: int, factors: int):
    import torch

    rd, csr = load(train_csv)
    trd, _ = load(test_csv)
    epochs = epochs_for(csr.n_users, iterations, csr.nnz)
    U, I, F = csr.n_users, csr.n_items, factors
    g = torch.Generator().manual_seed(42)
    P = torch.randn(U, F, generator=g) / F
    Q = torch.randn(I, F, generator=g) / F
    bu = torch.zeros(U)
    bi = torch.zeros(I)
    mu = rd.global_bias
    users = torch.from_numpy(csr.row_ids.astype(np.int64))
    items = torch.from_numpy(csr.indices.astype(np.int64))
    vals = torch.from_numpy(csr.data)
    lr, reg = 0.005, 0.02
    t0 = time.perf_counter()
    n = len(vals)
    batch = 8192
    for _ in range(epochs):
        perm = torch.randperm(n, generator=g)
        for s in range(0, n, batch):
            idx = perm[s:s + batch]
            u, i, r = users[idx], items[idx], vals[idx]
            pred = mu + bu[u] + bi[i] + (P[u] * Q[i]).sum(-1)
            e = (r - pred).unsqueeze(-1)
            P_u, Q_i = P[u], Q[i]
            P.index_add_(0, u, lr * (e * Q_i - reg * P_u))
            Q.index_add_(0, i, lr * (e * P_u - reg * Q_i))
            bu.index_add_(0, u, lr * (e.squeeze(-1) - reg * bu[u]))
            bi.index_add_(0, i, lr * (e.squeeze(-1) - reg * bi[i]))
    wall = time.perf_counter() - t0
    tu = torch.from_numpy(trd.users.astype(np.int64)).clamp(max=U - 1)
    ti = torch.from_numpy(trd.items.astype(np.int64)).clamp(max=I - 1)
    pred = mu + bu[tu] + bi[ti] + (P[tu] * Q[ti]).sum(-1)
    rmse = float(torch.sqrt(((torch.from_numpy(trd.ratings) - pred) ** 2)
                            .mean()))
    return {"library": "torch-cpu", "epochs": epochs, "wall_s": wall,
            "test_rmse": rmse}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("train_csv")
    p.add_argument("test_csv")
    p.add_argument("--iterations", type=int, default=5000)
    p.add_argument("--factors", type=int, default=50)
    args = p.parse_args(argv)
    try:
        res = run_surprise(args.train_csv, args.test_csv, args.iterations,
                           args.factors)
    except ImportError:
        print("scikit-surprise unavailable; using torch-cpu baseline")
        res = run_torch(args.train_csv, args.test_csv, args.iterations,
                        args.factors)
    print(res)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
