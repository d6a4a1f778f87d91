"""Data-layer tests — parity with reference tests/test_util.cu golden
values, plus native-ingest cross-checks."""

import numpy as np
import pytest

from cu2rec_tpu.data import (
    build_csr, load_matrix, read_array, read_ratings_csv, write_component,
    write_csv,
)
from cu2rec_tpu.data.ratings import _read_numpy


def test_read_csv_golden(toy_ratings):
    # test_util.cu:28-31: rows=6, cols=5, nnz=18, μ≈3.5556
    assert toy_ratings.n_users == 6
    assert toy_ratings.n_items == 5
    assert toy_ratings.nnz == 18
    assert abs(toy_ratings.global_bias - 64.0 / 18.0) < 1e-6
    # ids 0-based in memory
    assert toy_ratings.users.min() == 0
    assert toy_ratings.items.min() == 0


def test_csr_golden(toy_csr):
    # test_util.cu golden CSR for test_ratings.csv
    np.testing.assert_array_equal(toy_csr.indptr,
                                  [0, 4, 7, 10, 13, 16, 18])
    np.testing.assert_array_equal(
        toy_csr.indices,
        [0, 1, 2, 4, 0, 1, 2, 0, 1, 2, 0, 1, 2, 1, 3, 4, 3, 4])
    np.testing.assert_allclose(
        toy_csr.data,
        [1, 1, 1, 5, 3, 3, 3, 4, 4, 4, 5, 5, 5, 2, 4, 4, 5, 5])


def test_csr_missing_user(data_dir):
    # test_util.cu:123-125,170-172: user 2 has no ratings → indptr repeats
    rd = read_ratings_csv(str(data_dir / "test_missing_user_ratings.csv"))
    csr = build_csr(rd)
    np.testing.assert_array_equal(csr.indptr, [0, 4, 4, 7, 10, 13, 15])


def test_row_ids_inverse(toy_csr):
    rows = toy_csr.row_ids
    assert rows.shape[0] == toy_csr.nnz
    np.testing.assert_array_equal(
        rows, [0, 0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5])


def test_read_array(data_dir):
    # test_util.cu:36-46 equivalent on the checked-in Q fixture
    flat, n_rows, n_cols = read_array(str(data_dir / "test_Q.csv"))
    assert flat.shape[0] == n_rows * n_cols
    mat = load_matrix(str(data_dir / "test_Q.csv"))
    assert mat.shape == (n_rows, n_cols)


def test_write_read_roundtrip(tmp_path):
    # test_util.cu:50-94 equivalent
    data = np.arange(12, dtype=np.float32).reshape(3, 4) / 7.0
    path = tmp_path / "arr.csv"
    write_csv(str(path), data, 3, 4)
    back = load_matrix(str(path))
    np.testing.assert_allclose(back, data, atol=1e-6)


def test_component_naming(tmp_path):
    # util.cu:99-103 naming contract
    data = np.ones((2, 3), dtype=np.float32)
    p = write_component(str(tmp_path), "ratings_train", "p", data, 2, 3, 50)
    assert p.endswith("ratings_train_f50_p.csv")


def test_native_matches_python(data_dir, tmp_path):
    """Native C++ ingest must agree with the numpy fallback."""
    path = str(data_dir / "test_ratings.csv")
    a = read_ratings_csv(path, use_native=True)
    b = read_ratings_csv(path, use_native=False)
    np.testing.assert_array_equal(a.users, b.users)
    np.testing.assert_array_equal(a.items, b.items)
    np.testing.assert_allclose(a.ratings, b.ratings)
    assert a.global_bias == pytest.approx(b.global_bias)


def test_fallback_parser_exact_int64_ids(tmp_path):
    """The numpy fallback must parse id columns exactly — ids above 2^53
    round silently through float64 (ADVICE r4), which would hand the
    mapper wrong first-appearance codes when the native parser is
    unavailable."""
    big = 2**53 + 3  # not representable in float64
    path = tmp_path / "extreme.csv"
    path.write_text("userId,itemId,rating\n"
                    f"{big},7,4.5\n"
                    f"{big + 2},9,3.0\n")
    u, i, r = _read_numpy(str(path))
    assert u.tolist() == [big, big + 2]
    assert i.tolist() == [7, 9]
    np.testing.assert_allclose(r, [4.5, 3.0])


def test_fallback_parser_float_formatted_ids(tmp_path):
    """Float-formatted ids ("1.0") still parse via the permissive float
    path — the strict int64 parse must fall back, not reject or
    silently fill."""
    path = tmp_path / "floaty.csv"
    path.write_text("userId,itemId,rating\n1.0,2.0,3.5\n4.0,5.0,1.0\n")
    u, i, r = _read_numpy(str(path))
    assert u.tolist() == [1, 4]
    assert i.tolist() == [2, 5]
    np.testing.assert_allclose(r, [3.5, 1.0])


def test_native_large_roundtrip(tmp_path):
    """Native parser on a bigger generated file, odd formats included."""
    rng = np.random.default_rng(0)
    n = 50_000
    users = rng.integers(1, 500, n)
    items = rng.integers(1, 300, n)
    ratings = rng.uniform(0.5, 5.0, n).round(3)
    path = tmp_path / "big.csv"
    with open(path, "w") as f:
        f.write("userId,itemId,rating\n")
        for u, i, r in zip(users, items, ratings):
            f.write(f"{u},{i},{r}\n")
    rd = read_ratings_csv(str(path), use_native=True)
    assert rd.nnz == n
    np.testing.assert_array_equal(rd.users, users - 1)
    np.testing.assert_array_equal(rd.items, items - 1)
    np.testing.assert_allclose(rd.ratings, ratings, rtol=1e-5)


def test_unsorted_raises():
    from cu2rec_tpu.data.ratings import RatingsData
    rd = RatingsData(users=np.array([1, 0], dtype=np.int32),
                     items=np.array([0, 1], dtype=np.int32),
                     ratings=np.array([1.0, 2.0], dtype=np.float32),
                     n_users=2, n_items=2, global_bias=1.5)
    with pytest.raises(ValueError):
        build_csr(rd)


def test_native_space_padded_fields(data_dir):
    """The predict fixture has spaces after commas (`1, 1, 1.0`) — the
    reference's ifstream >> skips them (predict.cu via util.cu:17-45), so
    must we."""
    rd = read_ratings_csv(str(data_dir / "test_user_ratings.csv"))
    assert rd.nnz == 3
    np.testing.assert_array_equal(rd.items, [0, 1, 3])
    np.testing.assert_allclose(rd.ratings, [1.0, 1.0, 5.0])


def test_native_csr_build_matches_numpy():
    from cu2rec_tpu.data.csr import csr_from_arrays
    rng = np.random.default_rng(3)
    n, U, I = 200_000, 500, 300
    users = rng.integers(0, U, n).astype(np.int32)
    items = rng.integers(0, I, n).astype(np.int32)
    vals = rng.uniform(0.5, 5.0, n).astype(np.float32)
    a = csr_from_arrays(users, items, vals, U, I, use_native=True)
    b = csr_from_arrays(users, items, vals, U, I, use_native=False)
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_array_equal(a.indices, b.indices)
    # ratings may legitimately differ in order for duplicate (u,i) pairs;
    # compare per-(user,item) sorted values
    for u in range(0, U, 97):
        lo, hi = a.indptr[u], a.indptr[u + 1]
        np.testing.assert_allclose(np.sort(a.data[lo:hi]),
                                   np.sort(b.data[lo:hi]))


def test_native_matrix_writer_byte_identical(tmp_path):
    """The native component writer (ingest.cpp cu2rec_write_matrix) must
    produce byte-identical files to the pure-Python ``%f`` loop —
    including rounding ties, -0.0, and sub-decimal magnitudes."""
    pytest.importorskip("cu2rec_tpu.data.native")
    from cu2rec_tpu.data.native import get_lib, native_write_matrix
    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    mats = [
        np.array([[-0.0, 0.5, -1.5, 1e-8],
                  [123456.78125, -9.999999, 5e-7, 3.14159265]], np.float32),
        rng.normal(scale=10.0, size=(257, 7)).astype(np.float32),
    ]
    for k, m in enumerate(mats):
        native = tmp_path / f"n{k}.csv"
        native_write_matrix(str(native), m, *m.shape)
        python = tmp_path / f"p{k}.csv"
        with open(python, "w") as f:
            for row in m:
                f.write(",".join(f"{v:f}" for v in row))
                f.write("\n")
        assert native.read_bytes() == python.read_bytes()


def test_native_matrix_reader_parity(tmp_path):
    """The native matrix reader must match the Python per-value loop
    exactly (strtof is correctly rounded like Python float()), skip
    blank lines the same way, and reject ragged files so read_array
    falls back to the Python error behavior."""
    pytest.importorskip("cu2rec_tpu.data.native")
    from cu2rec_tpu.data.native import get_lib, native_read_matrix
    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(4)
    m = rng.normal(scale=3.0, size=(101, 9)).astype(np.float32)
    path = tmp_path / "m.csv"
    write_csv(str(path), m, 101, 9)
    flat, r, c = native_read_matrix(str(path))
    assert (r, c) == (101, 9)
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append([float(x) for x in line.split(",")])
    py = np.asarray(rows, np.float32).reshape(-1)
    assert np.array_equal(flat, py)

    blank = tmp_path / "blank.csv"
    blank.write_text("1.0,2.0\n\n  \n3.0,4.0\n")
    flat, r, c = native_read_matrix(str(blank))
    assert (r, c) == (2, 2) and flat.tolist() == [1.0, 2.0, 3.0, 4.0]
    # read_array goes through the same native path
    flat2, r2, c2 = read_array(str(blank))
    assert np.array_equal(flat2, flat) and (r2, c2) == (2, 2)

    ragged = tmp_path / "ragged.csv"
    ragged.write_text("1.0,2.0\n3.0\n")
    with pytest.raises(Exception):
        native_read_matrix(str(ragged))
    with pytest.raises(ValueError):
        read_array(str(ragged))  # python fallback raises on ragged input

    # strtof accepts hex floats that Python float() rejects; the native
    # reader must reject them too so both paths agree.
    hexf = tmp_path / "hex.csv"
    hexf.write_text("1.0,0x1p3\n2.0,3.0\n")
    with pytest.raises(Exception):
        native_read_matrix(str(hexf))


@pytest.mark.parametrize("where", ["first", "quarter", "middle", "last"])
def test_native_matrix_reader_multichunk_malformed(tmp_path, where):
    """A malformed line anywhere in a multi-chunk (>64KB, multi-threaded)
    file must fail the whole native read — in particular when the bad line
    is the first line of a worker's chunk, where a partially-parsed value
    buffer once slipped past the empty-chunk skip and overflowed the
    rows*cols copy buffer (advisor finding, ingest.cpp parse failure
    signalling)."""
    pytest.importorskip("cu2rec_tpu.data.native")
    from cu2rec_tpu.data.native import get_lib, native_read_matrix
    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    n_rows, n_cols = 3000, 8  # ~9 bytes/value -> ~216 KB, several chunks
    m = rng.normal(scale=2.0, size=(n_rows, n_cols)).astype(np.float32)
    lines = [",".join(f"{v:f}" for v in row) for row in m]
    bad_at = {"first": 0, "quarter": n_rows // 4, "middle": n_rows // 2,
              "last": n_rows - 1}[where]
    # Malformed mid-line: valid values before the bad token exercise the
    # partial-push path that must be discarded on failure.
    lines[bad_at] = "1.0,2.0,not_a_number,4.0,5.0,6.0,7.0,8.0"
    path = tmp_path / "big_bad.csv"
    path.write_text("\n".join(lines) + "\n")
    assert path.stat().st_size > (64 << 10)
    with pytest.raises(Exception):
        native_read_matrix(str(path))
    with pytest.raises(ValueError):
        read_array(str(path))  # python fallback also raises


def test_native_matrix_reader_chunk_first_line_malformed_everywhere(
        tmp_path):
    """Every other line malformed in a >64KB file: whatever the chunk
    split, some chunk starts with a bad line (the exact shape of the
    heap-OOB advisor finding).  Must raise, not silently drop rows."""
    pytest.importorskip("cu2rec_tpu.data.native")
    from cu2rec_tpu.data.native import get_lib, native_read_matrix
    if get_lib() is None:
        pytest.skip("native library unavailable")
    lines = []
    for i in range(6000):
        if i % 2 == 0:
            lines.append("1.5,oops,3.0,4.0,5.0,6.0,7.0,8.0")
        else:
            lines.append(",".join(f"{float(i + c):f}" for c in range(8)))
    path = tmp_path / "alternating_bad.csv"
    path.write_text("\n".join(lines) + "\n")
    assert path.stat().st_size > (64 << 10)
    with pytest.raises(Exception):
        native_read_matrix(str(path))


def test_native_matrix_writer_multiwave(tmp_path):
    """The bounded-memory wave writer must produce output identical to a
    single-pass serialization when rows span several waves (block_rows =
    2^20/cols rows per thread per wave)."""
    pytest.importorskip("cu2rec_tpu.data.native")
    from cu2rec_tpu.data.native import (get_lib, native_read_matrix,
                                        native_write_matrix)
    if get_lib() is None:
        pytest.skip("native library unavailable")
    import os
    n_cols = 16384              # block_rows = 64
    n_rows = 64 * (os.cpu_count() or 4) * 2 + 7   # > 2 waves, ragged tail
    rng = np.random.default_rng(12)
    m = rng.normal(scale=5.0, size=(n_rows, n_cols)).astype(np.float32)
    path = tmp_path / "waves.csv"
    native_write_matrix(str(path), m, n_rows, n_cols)
    flat, r, c = native_read_matrix(str(path))
    assert (r, c) == (n_rows, n_cols)
    # %f has 6 decimals; round-trip through text is exact for the strtof
    # decode of the printed decimal, compare against Python formatting of
    # a sample of rows to confirm wave boundaries didn't scramble order.
    for probe in (0, 63, 64, 65, n_rows // 2, n_rows - 1):
        expect = np.array([float(f"{v:f}") for v in m[probe]], np.float32)
        np.testing.assert_array_equal(flat[probe * n_cols:(probe + 1) * n_cols],
                                      expect)


# -- vectorized id mapper (data/mapping.py, round-4 rewrite) ------------------

def _reference_map(rows, user_mapping, item_mapping, add_missing=True):
    """The reference's per-row dict algorithm (map_items.py:21-62),
    kept ONLY here as the oracle the vectorized mapper must match."""
    out = []
    missing_u = missing_i = 0
    for u, i, r in rows:
        if u not in user_mapping:
            if add_missing:
                user_mapping[u] = len(user_mapping) + 1
            else:
                missing_u += 1
                continue
        if i not in item_mapping:
            if add_missing:
                item_mapping[i] = len(item_mapping) + 1
            else:
                missing_i += 1
                continue
        out.append([user_mapping[u], item_mapping[i], r])
    return out, missing_u, missing_i


def test_mapper_matches_reference_oracle(tmp_path):
    """Vectorized assign/drop semantics == the reference per-row loop,
    including first-appearance numbering, pre-existing mappings, and the
    drop-before-item-check ordering for unknown users."""
    from cu2rec_tpu.data.mapping import map_file

    rng = np.random.default_rng(3)
    rows = [(int(u), int(i), float(r)) for u, i, r in
            zip(rng.integers(1, 60, 500) * 7,
                rng.integers(1, 40, 500) * 3,
                rng.integers(1, 11, 500) / 2.0)]
    raw = tmp_path / "raw.csv"
    raw.write_text("userId,itemId,rating\n" +
                   "".join(f"{u},{i},{r}\n" for u, i, r in rows))

    # Fresh mappings, add_missing=True.
    um_ref, im_ref = {}, {}
    want, _, _ = _reference_map(rows, um_ref, im_ref)
    um, im = {}, {}
    mu, mi, r = map_file(str(raw), um, im)
    got = list(zip(mu.tolist(), mi.tolist(), r.tolist()))
    assert got == [tuple(w) for w in want]
    assert um == um_ref and im == im_ref

    # Second file through the SAME mappings with add_missing=False:
    # unknown users drop the row before the item check.
    rows2 = [(rows[0][0], 999999, 1.0),     # known user, unknown item
             (888888, 999999, 2.0),         # unknown user (item unseen)
             (rows[1][0], rows[1][1], 3.0)]  # fully known
    raw2 = tmp_path / "raw2.csv"
    raw2.write_text("userId,itemId,rating\n" +
                    "".join(f"{u},{i},{r}\n" for u, i, r in rows2))
    want2, mu_ref2, mi_ref2 = _reference_map(rows2, dict(um_ref),
                                             dict(im_ref),
                                             add_missing=False)
    mu2, mi2, r2 = map_file(str(raw2), um, im, add_missing=False)
    got2 = list(zip(mu2.tolist(), mi2.tolist(), r2.tolist()))
    assert got2 == [tuple(w) for w in want2]
    assert (mu_ref2, mi_ref2) == (1, 1)
    # 999999 must NOT have entered item_mapping (row dropped, no add).
    assert 999999 not in im and 888888 not in um


def test_mapper_output_byte_identical_fixture(tmp_path):
    """process_file output == the exact bytes the reference algorithm +
    writer contract produce (str(float(r)) values, sorted by user,
    within-user file order preserved)."""
    from cu2rec_tpu.data.mapping import process_file

    raw = tmp_path / "raw.csv"
    raw.write_text("userId,itemId,rating\n"
                   "900,7,4.0\n900,9,3.0\n5,7,5.0\n5,2,1.0\n77,9,2.0\n"
                   "900,2,4.5\n")
    out = tmp_path / "mapped.csv"
    process_file(str(raw), str(out))
    assert out.read_bytes() == (
        b"userId,itemId,rating\n"
        b"1,1,4.0\n1,2,3.0\n1,3,4.5\n"   # user 900 -> 1, file order kept
        b"2,1,5.0\n2,3,1.0\n"            # user 5 -> 2 (item 2 -> 3)
        b"3,2,2.0\n")                     # user 77 -> 3


def test_mapped_writer_native_matches_python(tmp_path):
    """The native table-indexed writer and the Python fallback emit
    identical bytes (both must match str(float(r)) formatting)."""
    from cu2rec_tpu.data.mapping import write_mapped_csv
    from cu2rec_tpu.data.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    users = np.asarray([1, 1, 2, 3], np.int64)
    items = np.asarray([4, 2, 1, 9], np.int64)
    ratings = np.asarray([4.0, 3.5, 0.5, 5.0], np.float32)
    a, b = tmp_path / "native.csv", tmp_path / "python.csv"
    write_mapped_csv(str(a), users, items, ratings)

    import unittest.mock as mock
    with mock.patch("cu2rec_tpu.data.native.native_write_ratings_mapped",
                    side_effect=RuntimeError("forced fallback")):
        write_mapped_csv(str(b), users, items, ratings)
    assert a.read_bytes() == b.read_bytes()
    assert a.read_text().splitlines()[1] == "1,4,4.0"


def test_netflix_mapping_flow(tmp_path, capsys):
    from cu2rec_tpu.data.netflix import process_netflix

    train = tmp_path / "nf_train.txt"
    train.write_text("10 5 3\n10 6 4\n20 5 5\n")
    test = tmp_path / "nf_test.txt"
    test.write_text("10 5 2\n30 5 1\n10 99 4\n")
    to, vo = tmp_path / "train_m.csv", tmp_path / "test_m.csv"
    process_netflix(str(train), str(to), str(test), str(vo))
    assert to.read_text() == ("userId,itemId,rating\n"
                              "1,1,3.0\n1,2,4.0\n2,1,5.0\n")
    # test rows with unseen user 30 / item 99 are dropped, with messages
    assert vo.read_text() == "userId,itemId,rating\n1,1,2.0\n"
    out = capsys.readouterr().out
    assert "Skipped 1 rows because of missing users" in out
    assert "Skipped 1 rows because of missing items" in out


def test_mapper_empty_and_header_only_files(tmp_path, monkeypatch):
    """Empty / header-only input produces a header-only mapped file on
    BOTH the native and NumPy-fallback paths (regression: genfromtxt
    shape (1,0) IndexError in the fallback)."""
    from cu2rec_tpu.data.mapping import process_file

    for env in ({}, {"CU2REC_NO_NATIVE": "1"}):
        for name, content in (("header.csv", "userId,itemId,rating\n"),
                              ("empty.csv", "")):
            for k, v in env.items():
                monkeypatch.setenv(k, v)
            src = tmp_path / f"{len(env)}_{name}"
            src.write_text(content)
            out = tmp_path / f"{len(env)}_{name}.mapped"
            import subprocess, sys
            import os
            repo = os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))
            code = ("import sys; sys.path.insert(0, %r); "
                    "from cu2rec_tpu.data.mapping import process_file; "
                    "process_file(sys.argv[1], sys.argv[2])" % repo)
            import os
            subprocess.run([sys.executable, "-c", code, str(src),
                            str(out)], check=True,
                           env={**os.environ, **env})
            assert out.read_bytes() == b"userId,itemId,rating\n"


def test_mapped_writer_non_f32_exact_rating(tmp_path):
    """A rating like 3.7 (not exactly representable in float32) must
    still write '3.7' — the reference's float64 str(float(r)) bytes —
    via the shortest-roundtrip float32 formatter, on both paths."""
    from cu2rec_tpu.data.mapping import process_file

    raw = tmp_path / "raw.csv"
    raw.write_text("userId,itemId,rating\n9,4,3.7\n9,5,2.6\n3,4,5\n")
    out = tmp_path / "mapped.csv"
    process_file(str(raw), str(out))
    native_bytes = out.read_bytes()
    assert native_bytes == (b"userId,itemId,rating\n"
                            b"1,1,3.7\n1,2,2.6\n2,1,5.0\n")
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ("import sys; sys.path.insert(0, %r); "
            "from cu2rec_tpu.data.mapping import process_file; "
            "process_file(sys.argv[1], sys.argv[2])" % repo)
    out2 = tmp_path / "mapped_fb.csv"
    subprocess.run([sys.executable, "-c", code, str(raw), str(out2)],
                   check=True,
                   env={**os.environ, "CU2REC_NO_NATIVE": "1"})
    assert out2.read_bytes() == native_bytes


def test_mapper_negative_and_extreme_ids(tmp_path):
    """The factorizer's id domain is full int64 (only INT64_MIN is
    rejected): negative and huge raw ids map through the same
    first-appearance rule as the reference dict loop."""
    from cu2rec_tpu.data.mapping import map_file

    rng = np.random.default_rng(9)
    ids_pool = np.asarray([-5, -1, 0, 7, 2**62, -(2**61), 123456789012345])
    rows = [(int(ids_pool[rng.integers(len(ids_pool))]),
             int(ids_pool[rng.integers(len(ids_pool))]),
             float(rng.integers(1, 6))) for _ in range(200)]
    raw = tmp_path / "raw.csv"
    raw.write_text("userId,itemId,rating\n" +
                   "".join(f"{u},{i},{r}\n" for u, i, r in rows))
    um_ref, im_ref = {}, {}
    want, _, _ = _reference_map(rows, um_ref, im_ref)
    um, im = {}, {}
    mu, mi, r = map_file(str(raw), um, im)
    got = list(zip(mu.tolist(), mi.tolist(), r.tolist()))
    assert got == [tuple(w) for w in want]
    assert um == um_ref and im == im_ref


def test_package_import_does_not_init_backend():
    """Importing cu2rec_tpu must not initialize the JAX backend: a
    module-level jnp constant used to trigger device resolution at
    import, which BLOCKS FOREVER on a machine whose accelerator runtime
    is unreachable (the r5 dead-relay hang) — and makes every
    subprocess that merely wants the numpy data path hostage to the
    device.  Run in a fresh interpreter so prior test imports don't
    mask the regression."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "def spy(*a, **k): raise SystemExit('backend init at import')\n"
        "jax._src.xla_bridge.backends = spy\n"
        "import cu2rec_tpu\n"
        "import cu2rec_tpu.serve.engine, cu2rec_tpu.parallel.serving\n"
        "import cu2rec_tpu.data.mapping, cu2rec_tpu.serve.client\n"
        "print('IMPORT_PURE')\n" % repo)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=120,
                         env={k: v for k, v in os.environ.items()
                              if k != "CU2REC_PLATFORM"})
    assert "IMPORT_PURE" in out.stdout, out.stdout + out.stderr
