"""Id mapping: arbitrary user/item ids → sequential 1-based ints.

Capability parity with reference preprocessing/map_items.py: ``map_rows``
(with ``add_missing=False`` drop-unknown mode for test sets), sort-by-user,
and the ``userId,itemId,rating`` header output format.  Vectorized with
NumPy instead of per-row dict lookups.
"""

from __future__ import annotations

import csv

import numpy as np

from cu2rec_tpu.data.ratings import write_ratings_csv


def get_sequential_info(row):
    """Default column layout: userId, itemId, rating, <ignored...>
    (reference map_items.py:13-18)."""
    return int(row[0]), int(row[1]), float(row[2])


def map_rows(filename, user_mapping: dict, item_mapping: dict, delimiter=",",
             has_header=True, get_info=get_sequential_info, add_missing=True):
    """Map file rows through the given id dicts (mutated in place when
    ``add_missing``); unknown ids are dropped otherwise, with a count printed
    (reference map_items.py:21-62)."""
    rows = []
    missing_users = 0
    missing_items = 0
    with open(filename) as f:
        reader = csv.reader(f, delimiter=delimiter)
        if has_header:
            next(reader, None)
        for row in reader:
            if not row:
                continue
            user_id, item_id, rating = get_info(row)
            if user_id not in user_mapping:
                if add_missing:
                    user_mapping[user_id] = len(user_mapping) + 1
                else:
                    missing_users += 1
                    continue
            if item_id not in item_mapping:
                if add_missing:
                    item_mapping[item_id] = len(item_mapping) + 1
                else:
                    missing_items += 1
                    continue
            rows.append([user_mapping[user_id], item_mapping[item_id], rating])
    if missing_users:
        print(f"Skipped {missing_users} rows because of missing users")
    if missing_items:
        print(f"Skipped {missing_items} rows because of missing items")
    return rows


def map_arrays(users: np.ndarray, items: np.ndarray,
               user_mapping: dict | None = None,
               item_mapping: dict | None = None):
    """Vectorized variant for array inputs: first-appearance order, 1-based
    (same assignment rule as map_rows)."""
    def seq_map(ids, mapping):
        if mapping is None:
            mapping = {}
        uniq, first_pos = np.unique(ids, return_index=True)
        for raw in ids[np.sort(first_pos)]:
            raw = int(raw)
            if raw not in mapping:
                mapping[raw] = len(mapping) + 1
        lut = {k: v for k, v in mapping.items()}
        return np.asarray([lut[int(x)] for x in ids], dtype=np.int64), mapping
    mapped_u, user_mapping = seq_map(users, user_mapping)
    mapped_i, item_mapping = seq_map(items, item_mapping)
    return mapped_u, mapped_i, user_mapping, item_mapping


def sort_by_user(rows):
    """Stable sort by mapped user id (reference map_items.py:65-77)."""
    return sorted(rows, key=lambda r: r[0])


def process_file(filename_in: str, filename_out: str) -> None:
    user_mapping: dict = {}
    item_mapping: dict = {}
    rows = sort_by_user(map_rows(filename_in, user_mapping, item_mapping))
    write_ratings_csv(filename_out, rows)
