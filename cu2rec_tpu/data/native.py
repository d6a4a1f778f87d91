"""ctypes loader for the native C++ ingest library.

The library (cu2rec_tpu/native/ingest.cpp) is compiled on first use with the
system g++ and cached next to its source; set CU2REC_NO_NATIVE=1 to disable
and force the pure-NumPy fallback in cu2rec_tpu.data.ratings.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libcu2rec_ingest.so"))
_SRC_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "ingest.cpp"))


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-o",
             _SO_PATH, _SRC_PATH, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the ingest shared library, or None."""
    global _LIB, _TRIED
    if os.environ.get("CU2REC_NO_NATIVE"):
        return None
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO_PATH) or (
                os.path.exists(_SRC_PATH)
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.cu2rec_ingest_open.restype = ctypes.c_void_p
        lib.cu2rec_ingest_open.argtypes = [ctypes.c_char_p, ctypes.c_char,
                                           ctypes.c_int]
        lib.cu2rec_ingest_count.restype = ctypes.c_int64
        lib.cu2rec_ingest_count.argtypes = [ctypes.c_void_p]
        lib.cu2rec_ingest_copy.restype = None
        lib.cu2rec_ingest_copy.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.cu2rec_ingest_close.restype = None
        lib.cu2rec_ingest_close.argtypes = [ctypes.c_void_p]
        lib.cu2rec_csr_build.restype = ctypes.c_int
        lib.cu2rec_csr_build.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.cu2rec_write_ratings.restype = ctypes.c_int
        lib.cu2rec_write_ratings.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.cu2rec_write_ratings_mapped.restype = ctypes.c_int
        lib.cu2rec_write_ratings_mapped.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
        ]
        lib.cu2rec_factorize.restype = ctypes.c_int64
        lib.cu2rec_factorize.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.cu2rec_sort_ratings_by_user.restype = ctypes.c_int
        lib.cu2rec_sort_ratings_by_user.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.cu2rec_write_matrix.restype = ctypes.c_int
        lib.cu2rec_write_matrix.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
        ]
        lib.cu2rec_matrix_open.restype = ctypes.c_void_p
        lib.cu2rec_matrix_open.argtypes = [ctypes.c_char_p]
        lib.cu2rec_matrix_rows.restype = ctypes.c_int64
        lib.cu2rec_matrix_rows.argtypes = [ctypes.c_void_p]
        lib.cu2rec_matrix_cols.restype = ctypes.c_int64
        lib.cu2rec_matrix_cols.argtypes = [ctypes.c_void_p]
        lib.cu2rec_matrix_copy.restype = None
        lib.cu2rec_matrix_copy.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_float)]
        lib.cu2rec_matrix_close.restype = None
        lib.cu2rec_matrix_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def native_read_ratings(path: str, delim: int, skip_lines: int):
    """Parse a ratings file natively → (users, items, ratings) numpy arrays.

    Raises if the native library is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    handle = lib.cu2rec_ingest_open(path.encode(), delim, skip_lines)
    if not handle:
        raise RuntimeError(f"native ingest failed to open {path}")
    try:
        n = lib.cu2rec_ingest_count(handle)
        if n < 0:
            raise RuntimeError("native ingest count failed")
        users = np.empty(n, dtype=np.int64)
        items = np.empty(n, dtype=np.int64)
        ratings = np.empty(n, dtype=np.float32)
        if n:
            lib.cu2rec_ingest_copy(
                handle,
                users.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                items.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ratings.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    finally:
        lib.cu2rec_ingest_close(handle)
    return users, items, ratings


def native_write_ratings(path: str, users: np.ndarray, items: np.ndarray,
                         ratings: np.ndarray,
                         header: str = "userId,itemId,rating") -> None:
    """Parallel ratings-CSV writer (0-based arrays → 1-based file, the
    write_to_file contract of the reference's map_items.py:80-89).

    Raises if the native library is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    n = users.shape[0]
    users = np.ascontiguousarray(users, dtype=np.int32)
    items = np.ascontiguousarray(items, dtype=np.int32)
    ratings = np.ascontiguousarray(ratings, dtype=np.float32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.cu2rec_write_ratings(
        path.encode(), users.ctypes.data_as(i32p),
        items.ctypes.data_as(i32p), ratings.ctypes.data_as(f32p), n,
        header.encode() if header else b"")
    if rc != 0:
        raise OSError(f"native_write_ratings failed for {path}")


def native_write_ratings_mapped(path: str, users: np.ndarray,
                                items: np.ndarray, vidx: np.ndarray,
                                table: list[str],
                                header: str = "userId,itemId,rating") -> None:
    """Parallel mapped-ratings writer: ids written AS GIVEN (1-based mapped
    ids), ratings via a preformatted string table indexed per row — the
    byte-exact fast path for the vectorized id mapper.

    Raises if the native library is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    n = users.shape[0]
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    vidx = np.ascontiguousarray(vidx, dtype=np.int64)
    tarr = np.asarray([t.encode() for t in table], dtype="S")
    stride = tarr.dtype.itemsize
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.cu2rec_write_ratings_mapped(
        path.encode(), users.ctypes.data_as(i64p),
        items.ctypes.data_as(i64p), vidx.ctypes.data_as(i64p),
        tarr.ctypes.data_as(ctypes.c_char_p), stride, len(table), n,
        header.encode() if header else b"")
    if rc != 0:
        raise OSError(f"native_write_ratings_mapped failed for {path}")


def native_factorize(ids: np.ndarray, mapping: dict, add_missing: bool):
    """Single-pass hash factorization with the reference's first-appearance
    assignment rule (map_items.py:40-54): returns ``codes`` (int64 mapped
    values, 0 where unknown and not added) and mutates ``mapping`` like the
    reference's dict.

    Raises if the native library is unavailable (caller falls back to the
    NumPy unique/searchsorted path).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    n = ids.shape[0]
    nk = len(mapping)
    ex_keys = np.fromiter(mapping.keys(), np.int64, nk)
    ex_vals = np.fromiter(mapping.values(), np.int64, nk)
    codes = np.empty(n, dtype=np.int64)
    new_keys = np.empty(n if add_missing else 0, dtype=np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n_new = lib.cu2rec_factorize(
        ids.ctypes.data_as(i64p), n,
        ex_keys.ctypes.data_as(i64p), ex_vals.ctypes.data_as(i64p),
        nk, nk + 1, 1 if add_missing else 0,
        codes.ctypes.data_as(i64p), new_keys.ctypes.data_as(i64p),
        new_keys.shape[0])
    if n_new < 0:
        raise ValueError("native_factorize failed (id == INT64_MIN?)")
    if n_new:
        mapping.update(zip(new_keys[:n_new].tolist(),
                           range(nk + 1, nk + 1 + int(n_new))))
    return codes


def native_sort_by_user(users: np.ndarray, items: np.ndarray,
                        ratings: np.ndarray, n_users: int):
    """Fused stable counting-sort of (users, items, ratings) by 1-based
    mapped user id — one parallel scatter pass instead of argsort + three
    gathers.  Raises if the library is unavailable or ids out of range.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    n = users.shape[0]
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    ratings = np.ascontiguousarray(ratings, dtype=np.float32)
    out_u = np.empty(n, dtype=np.int64)
    out_i = np.empty(n, dtype=np.int64)
    out_r = np.empty(n, dtype=np.float32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.cu2rec_sort_ratings_by_user(
        users.ctypes.data_as(i64p), items.ctypes.data_as(i64p),
        ratings.ctypes.data_as(f32p), n, n_users,
        out_u.ctypes.data_as(i64p), out_i.ctypes.data_as(i64p),
        out_r.ctypes.data_as(f32p))
    if rc != 0:
        raise ValueError("user id out of range in native_sort_by_user")
    return out_u, out_i, out_r


def native_write_matrix(path: str, data: np.ndarray, rows: int,
                        cols: int) -> None:
    """Parallel component-matrix CSV writer — byte-compatible with the
    Python writer in data/ratings.py (one row per line, ``%f`` values,
    reference writeCSV util.cu:86-97).

    Raises if the native library is unavailable (caller falls back).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    data = np.ascontiguousarray(data, dtype=np.float32).reshape(rows, cols)
    rc = lib.cu2rec_write_matrix(
        path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, cols)
    if rc != 0:
        raise OSError(f"native_write_matrix failed for {path}")


def native_read_matrix(path: str) -> tuple[np.ndarray, int, int]:
    """Parallel component-matrix CSV reader → ``(flat, n_rows, n_cols)``.

    Values are decoded with strtof (correctly rounded, bit-identical to
    Python ``float()`` for float32).  Raises if the library is
    unavailable or the file is malformed/ragged (caller falls back to
    the pure-Python reader and its error behavior).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    handle = lib.cu2rec_matrix_open(path.encode())
    if not handle:
        raise RuntimeError(f"native matrix read failed for {path}")
    try:
        rows = lib.cu2rec_matrix_rows(handle)
        cols = lib.cu2rec_matrix_cols(handle)
        flat = np.empty(rows * cols, dtype=np.float32)
        lib.cu2rec_matrix_copy(
            handle, flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    finally:
        lib.cu2rec_matrix_close(handle)
    return flat, int(rows), int(cols)


def native_csr_build(users: np.ndarray, items: np.ndarray,
                     ratings: np.ndarray, n_users: int):
    """Parallel counting-sort CSR build: returns
    (indptr, sorted_items, sorted_ratings) sorted by (user, item).

    Raises if the native library is unavailable or ids are out of range
    (caller falls back to the NumPy path).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native ingest unavailable")
    n = users.shape[0]
    users = np.ascontiguousarray(users, dtype=np.int32)
    items = np.ascontiguousarray(items, dtype=np.int32)
    ratings = np.ascontiguousarray(ratings, dtype=np.float32)
    indptr = np.empty(n_users + 1, dtype=np.int32)
    out_items = np.empty(n, dtype=np.int32)
    out_ratings = np.empty(n, dtype=np.float32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.cu2rec_csr_build(
        users.ctypes.data_as(i32p), items.ctypes.data_as(i32p),
        ratings.ctypes.data_as(f32p), n, n_users,
        indptr.ctypes.data_as(i32p), out_items.ctypes.data_as(i32p),
        out_ratings.ctypes.data_as(f32p))
    if rc != 0:
        raise ValueError("user id out of range in native_csr_build")
    return indptr, out_items, out_ratings
