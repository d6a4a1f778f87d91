"""``predict`` — fold-in a new user and print ranked recommendations
(reference predict.cu parity).

    python -m cu2rec_tpu.cli.predict -c cfg -i item_bias.csv \
        -g global_bias.csv -q q.csv user_ratings.csv

Same flow as predict.cu:72-133: load trained Q/item_bias/global_bias, read
the user's ratings (any user ids are remapped to user 0, predict.cu:119-122),
partial-fit only the P row and user bias (``is_train=false`` → frozen item
tables), score the whole catalog, filter already-rated items, print ranked
recommendations.  Scoring runs on the MXU instead of a CPU loop, and the
ranked sort is ``top_k`` on device.
"""

from __future__ import annotations

import argparse

import numpy as np

from cu2rec_tpu.data import read_ratings_csv
from cu2rec_tpu.serve.foldin import fold_in_user
from cu2rec_tpu.serve.recommend import predict_all_items, ranked_items
from cu2rec_tpu.utils.checkpoint import load_item_components
from cu2rec_tpu.utils.config import Config


def build_parser():
    p = argparse.ArgumentParser(prog="predict", description=__doc__)
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-i", "--item-bias", required=True)
    p.add_argument("-g", "--global-bias", required=True)
    p.add_argument("-q", "--q-matrix", required=True)
    p.add_argument("user_ratings_csv")
    p.add_argument("-k", "--top-k", type=int, default=0,
                   help="print only the top K recommendations (0 = all)")
    p.add_argument("--implicit", action="store_true",
                   help="iALS-exported model: fold in with the exact "
                        "one-shot ridge solve (ratings act as confidence "
                        "strengths) instead of SGD iterations")
    p.add_argument("--alpha", type=float, default=40.0,
                   help="implicit confidence slope c = 1 + alpha*r")
    p.add_argument("--reg", type=float, default=None,
                   help="implicit ridge lambda (default: config P_reg)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from cu2rec_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    cfg.read_config(args.config)
    cfg.is_train = False

    Q, item_bias, global_bias = load_item_components(
        args.q_matrix, args.item_bias, args.global_bias)

    user_rd = read_ratings_csv(args.user_ratings_csv)
    rated = user_rd.items
    ratings = user_rd.ratings

    if args.implicit:
        # Exact one-shot implicit partial fit (ops/ials.ials_fold_in):
        # no iterations/lr; biases play no role in the implicit score.
        import jax.numpy as jnp

        from cu2rec_tpu.ops.ials import ials_fold_in
        x = np.asarray(ials_fold_in(
            jnp.asarray(Q, jnp.float32),
            np.asarray(rated, np.int32)[None, :],
            np.asarray(ratings, np.float32)[None, :],
            np.ones((1, len(rated)), bool), args.alpha,
            args.reg if args.reg is not None else cfg.P_reg))[0]
        scores = np.asarray(Q, np.float32) @ x
    else:
        model, _losses = fold_in_user(Q, item_bias, global_bias, rated,
                                      ratings, cfg)
        scores = np.asarray(predict_all_items(
            model.P[0], model.user_bias[0], model.Q, model.item_bias,
            model.global_bias))

    # Print predictions (predict.cu:31-38 format).
    print("Predictions: ")
    print("[" + "".join(f"{s:g}, " for s in scores) + "]")

    rated_set = set(int(i) for i in rated)
    recs = [(s, i) for s, i in ranked_items(scores) if i not in rated_set]
    if args.top_k:
        recs = recs[:args.top_k]
    print("Recommendations:")
    for rank, (score, item) in enumerate(recs, 1):
        print(f"Rank: {rank}\tItem: {item}\tEstimated rating: {score:f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
