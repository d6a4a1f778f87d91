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
    args = p.parse_args(argv)

    rows = read_rating_rows(args.file_ratings)
    splitter = split_per_user if args.per_user else split_true
    train, test = splitter(rows, 1 - args.test_ratio, seed=args.seed)

    filepath, extension = os.path.splitext(args.file_ratings)
    write_ratings_csv(f"{filepath}_train{extension}", train)
    write_ratings_csv(f"{filepath}_test{extension}", test)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
