"""Ratings and component-array I/O.

Capability parity with reference matrix_factorization/util.cu:
  * ``read_ratings_csv``  ≙ ``readCSV``        (util.cu:17-45)
  * ``read_array``        ≙ ``read_array``     (util.cu:52-81)
  * ``write_csv``         ≙ ``writeCSV``       (util.cu:86-97)
  * ``write_component``   ≙ ``writeToFile``    (util.cu:99-103)

File contracts preserved exactly:
  * ratings files are ``userId,itemId,rating`` with a header line, ids are
    sequential and 1-based on disk, 0-based in memory; the number of users /
    items is the maximum id; the global bias is the mean rating;
  * component CSVs are row-major floats printed with 6 decimals and named
    ``{dir}/{base}_f{factors}_{component}.csv``.

Unlike the reference's line-by-line ifstream parse, bulk ingest goes through
a native C++ extension (cu2rec_tpu/native/ingest.cpp, loaded via ctypes) so
100M-row Netflix-scale files don't bottleneck on Python; a pure-NumPy
fallback is always available.  ``read_array`` also fixes the reference's
quirk where the returned ``n_cols`` was the *total* value count rather than
the per-row column count (util.cu:64-66) — here it is the real column count.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class RatingsData:
    """A parsed ratings file (the array-of-struct ``vector<Rating>`` of the
    reference, util.h:19-24, as structure-of-arrays)."""

    users: np.ndarray   # int32, 0-based
    items: np.ndarray   # int32, 0-based
    ratings: np.ndarray  # float32
    n_users: int        # = max 1-based userId
    n_items: int        # = max 1-based itemId
    global_bias: float  # mean rating

    @property
    def nnz(self) -> int:
        return int(self.users.shape[0])


def _read_numpy(path: str, delimiter: str = ",", skip_header: int = 1):
    # Parse the id columns as int64 DIRECTLY: routing them through
    # float64 silently rounds ids above 2^53, which would make the
    # fallback disagree with the native parser's (and the reference's,
    # util.cu:17-45) exact integer parse — the mapper would then assign
    # wrong first-appearance codes for extreme ids.
    #
    # Sniff ONE data line first: a file with float-formatted ids
    # ("1.0") would otherwise pay a full strict-parse pass whose result
    # is thrown away before the permissive re-read (2× parse time on
    # exactly the files the fallback exists for).  The astype below
    # still raises on mixed files the sniff mispredicts.
    strict = True
    try:
        with open(path) as f:
            for _ in range(skip_header):
                f.readline()
            first = f.readline().strip()
        if first:
            parts = [p.strip() for p in first.split(delimiter)]
            int(parts[0]), int(parts[1])
    except (ValueError, IndexError):
        strict = False
    except OSError:
        pass  # let genfromtxt produce the canonical error below
    try:
        if not strict:
            raise ValueError("float-formatted ids (sniffed)")
        # Read the id columns as strings and convert with the exact
        # int64 parse (astype raises on "1.0"-style ids rather than
        # silently filling, unlike genfromtxt's own int converter).
        raw = np.genfromtxt(
            path, delimiter=delimiter, skip_header=skip_header,
            dtype=[("u", "U24"), ("i", "U24"), ("r", np.float32)])
        if raw.ndim == 0:
            raw = raw[None]
        if raw.size == 0:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, np.float32))
        return (raw["u"].astype(np.int64), raw["i"].astype(np.int64),
                raw["r"].copy())
    except Exception:
        # Ids not plain integers (e.g. "1.0") — fall back to the
        # permissive float64 parse below.
        pass
    raw = np.genfromtxt(path, delimiter=delimiter, skip_header=skip_header,
                        dtype=np.float64)
    if raw.ndim == 1:
        raw = raw[None, :]
    if raw.shape[1] == 0:
        # Empty / header-only file: genfromtxt yields shape (1, 0); the
        # column slices below would IndexError where the native parser
        # (and the reference reader) return zero rows.
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float32))
    return (raw[:, 0].astype(np.int64), raw[:, 1].astype(np.int64),
            raw[:, 2].astype(np.float32))


def read_ratings_csv(path: str, delimiter: str = ",", has_header: bool = True,
                     use_native: bool = True) -> RatingsData:
    """Read a ``userId,itemId,rating`` CSV (1-based ids, header line).

    Returns ids 0-based with n_users/n_items = max id and global_bias = mean,
    matching reference util.cu:17-45.
    """
    u = i = r = None
    if use_native:
        try:
            from cu2rec_tpu.data.native import native_read_ratings
            u, i, r = native_read_ratings(path, ord(delimiter),
                                          1 if has_header else 0)
        except Exception:
            u = None
    if u is None:
        u, i, r = _read_numpy(path, delimiter, 1 if has_header else 0)
    if u.shape[0] == 0:
        raise ValueError(f"no ratings parsed from {path}")
    n_users = int(u.max())
    n_items = int(i.max())
    global_bias = float(np.mean(r, dtype=np.float64))
    return RatingsData(
        users=(u - 1).astype(np.int32),
        items=(i - 1).astype(np.int32),
        ratings=r.astype(np.float32),
        n_users=n_users,
        n_items=n_items,
        global_bias=global_bias,
    )


def read_array(path: str) -> tuple[np.ndarray, int, int]:
    """Read a 2D float CSV into a row-major float32 array.

    Returns ``(flat_values, n_rows, n_cols)``.  Reference parity:
    util.cu:52-81, except ``n_cols`` is the true per-row column count (the
    reference returned the total value count; its callers only used the
    values transiently so the fix is safe).

    Bulk reads go through the native parallel parser (ingest.cpp) — a
    Netflix-scale component (480K × 300) takes ~minutes through the
    per-value Python loop below, which remains as the fallback (and
    supplies the error behavior for malformed/ragged files).
    """
    try:
        from cu2rec_tpu.data.native import native_read_matrix
        return native_read_matrix(path)
    except Exception:
        pass
    rows = []
    n_cols = 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            vals = [float(x) for x in line.split(",")]
            n_cols = len(vals)
            rows.append(vals)
    arr = np.asarray(rows, dtype=np.float32)
    return arr.reshape(-1), len(rows), n_cols


def load_matrix(path: str) -> np.ndarray:
    """Read a component CSV as a 2D float32 array."""
    flat, n_rows, n_cols = read_array(path)
    return flat.reshape(n_rows, n_cols)


def write_csv(path: str, data: np.ndarray, rows: int, cols: int) -> None:
    """Row-major float dump with 6 decimals (reference util.cu:86-97).

    Goes through the native parallel writer (ingest.cpp,
    byte-compatible output) when available; the Python loop below is
    the fallback.
    """
    try:
        from cu2rec_tpu.data.native import native_write_matrix
        native_write_matrix(path, data, rows, cols)
        return
    except Exception:
        pass
    data = np.asarray(data, dtype=np.float32).reshape(rows, cols)
    with open(path, "w") as f:
        for row in data:
            f.write(",".join(f"{v:f}" for v in row))
            f.write("\n")


def component_path(parent_dir: str, base: str, component: str,
                   factors: int, extension: str = "csv") -> str:
    """``{dir}/{base}_f{factors}_{component}.{ext}`` (util.cu:99-103)."""
    return os.path.join(parent_dir, f"{base}_f{factors}_{component}.{extension}")


def write_component(parent_dir: str, base: str, component: str,
                    data: np.ndarray, rows: int, cols: int,
                    factors: int, extension: str = "csv") -> str:
    path = component_path(parent_dir, base, component, factors, extension)
    write_csv(path, data, rows, cols)
    return path


def write_ratings_csv(path: str, rows) -> None:
    """Write ``userId,itemId,rating`` rows (1-based) with header
    (reference preprocessing/map_items.py:80-89)."""
    with open(path, "w", newline="") as f:
        f.write("userId,itemId,rating\n")
        for row in rows:
            f.write(",".join(str(v) for v in row))
            f.write("\n")
