"""Netflix-prize format mapping (reference preprocessing/map_netflix.py).

Netflix training files are space-delimited, headerless, with the rating in
column 3 (0-indexed: 2); test rows referencing unseen users/items are
dropped via ``add_missing=False`` (map_netflix.py:9-28).
"""

from __future__ import annotations

from cu2rec_tpu.data.mapping import map_rows, sort_by_user
from cu2rec_tpu.data.ratings import write_ratings_csv


def get_netflix_info(row):
    return int(row[0]), int(row[1]), float(row[2])


def process_netflix(train_in: str, train_out: str,
                    test_in: str | None = None, test_out: str | None = None,
                    delimiter: str = " ") -> None:
    user_mapping: dict = {}
    item_mapping: dict = {}
    rows = sort_by_user(map_rows(
        train_in, user_mapping, item_mapping, delimiter=delimiter,
        has_header=False, get_info=get_netflix_info, add_missing=True))
    write_ratings_csv(train_out, rows)
    if test_in and test_out:
        rows = sort_by_user(map_rows(
            test_in, user_mapping, item_mapping, delimiter=delimiter,
            has_header=False, get_info=get_netflix_info, add_missing=False))
        write_ratings_csv(test_out, rows)
