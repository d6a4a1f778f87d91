"""Split a ratings CSV into train/test sets
(reference preprocessing/split_to_test_train.py CLI)."""

from __future__ import annotations

import argparse
import os

from cu2rec_tpu.data.ratings import write_ratings_csv
from cu2rec_tpu.data.split import read_rating_rows, split_per_user, split_true


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Splits a csv file into training and test sets")
    p.add_argument("file_ratings")
    p.add_argument("test_ratio", type=float)
    p.add_argument("-s", "--seed", type=int, default=42)
    p.add_argument("--per-user", action="store_true",
                   help="stratify the split per user")
    p.add_argument("--fast", action="store_true", default=None,
                   help="vectorized numpy split + native parallel writer "
                        "(auto above 2M rows); same seeded-global-shuffle "
                        "protocol, different permutation stream")
    args = p.parse_args(argv)

    filepath, extension = os.path.splitext(args.file_ratings)
    fast = args.fast
    if fast is None and not args.per_user:
        fast = os.path.getsize(args.file_ratings) > (2 << 20) * 16
    if fast and not args.per_user:
        import numpy as np
        from cu2rec_tpu.data.native import native_write_ratings
        from cu2rec_tpu.data.ratings import read_ratings_csv
        from cu2rec_tpu.data.synth import split_arrays
        rd = read_ratings_csv(args.file_ratings)
        tr, te = split_arrays(rd.users, rd.items, rd.ratings,
                              1 - args.test_ratio, seed=args.seed)

        def write(path, users, items, ratings):
            try:
                native_write_ratings(path, users, items, ratings)
            except (RuntimeError, OSError, AttributeError):
                # RuntimeError: lib unavailable; AttributeError: stale .so
                # without cu2rec_write_ratings; OSError: write failure.
                # native lib unavailable — slower NumPy fallback, same
                # 1-based-file contract as the native writer.
                with open(path, "w") as f:
                    f.write("userId,itemId,rating\n")
                    np.savetxt(f, np.column_stack(
                        [users + 1, items + 1, ratings]),
                        fmt="%d,%d,%.3f")  # match the native writer's
                    # %.3f so both paths emit byte-identical files

        write(f"{filepath}_train{extension}", *tr)
        write(f"{filepath}_test{extension}", *te)
        return 0

    rows = read_rating_rows(args.file_ratings)
    splitter = split_per_user if args.per_user else split_true
    train, test = splitter(rows, 1 - args.test_ratio, seed=args.seed)

    write_ratings_csv(f"{filepath}_train{extension}", train)
    write_ratings_csv(f"{filepath}_test{extension}", test)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
