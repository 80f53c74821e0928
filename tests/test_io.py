"""Tests for the BGZF / MatrixMarket / index IO layer."""

import gzip
import os

import numpy as np
import pytest

from mmvae_tpu.io import bgzf, index, mtx, native, writers
from tests.conftest import make_count_matrix


def test_bgzf_roundtrip(tmp_path):
    path = str(tmp_path / "t.gz")
    payload = b"hello world\n" * 50000  # spans multiple 64K blocks
    w = bgzf.BgzfWriter(path)
    w.write(payload)
    w.close()
    assert bgzf.is_bgzf(path)
    # whole-file inflate equals payload
    with bgzf.BgzfReader(path) as r:
        assert r.read_all() == payload
    # interop: python gzip reads multi-member bgzf
    assert gzip.open(path, "rb").read() == payload


def test_bgzf_voffset_seek(tmp_path):
    path = str(tmp_path / "t.gz")
    lines = [f"line {i} {'x' * (i % 97)}".encode() for i in range(20000)]
    w = bgzf.BgzfWriter(path)
    voffs = []
    for ln in lines:
        voffs.append(w.tell_voffset())
        w.write(ln + b"\n")
    w.close()
    with bgzf.BgzfReader(path) as r:
        for i in [0, 1, 777, 9999, 19999]:
            r.seek_voffset(voffs[i])
            assert r.readline() == lines[i]


def test_bgzf_readline_tell_invariant(tmp_path):
    """tell after readline == recorded start voffset of the next line."""
    path = str(tmp_path / "t.gz")
    w = bgzf.BgzfWriter(path)
    starts = []
    for i in range(5000):
        starts.append(w.tell_voffset())
        w.write(f"{i} {i * 7}\n")
    w.close()
    with bgzf.BgzfReader(path) as r:
        for i in range(4999):
            assert r.readline() is not None
            assert r.tell_voffset() == starts[i + 1]


def test_peek_header_and_native_agree(mtx_file):
    path, _, dens = mtx_file
    hdr = mtx.peek_mtx_header(path)
    assert (hdr.rows, hdr.cols) == dens.shape
    assert hdr.nnz == int((dens > 0).sum())
    if native.available():
        assert native.peek_header(path) == (hdr.rows, hdr.cols, hdr.nnz)


def test_index_build_read(mtx_file):
    path, idx_path, dens = mtx_file
    tab = index.read_mmutil_index(idx_path)
    assert len(tab) == dens.shape[1]
    assert index.check_index_tab(path, tab)


def test_index_python_native_agree(mtx_file):
    if not native.available():
        pytest.skip("native extension unavailable")
    path, _, _ = mtx_file
    assert index._build_index_python(path) == native.build_index(path)


def test_index_rejects_plain_gzip(tmp_path):
    path = str(tmp_path / "plain.mtx.gz")
    with gzip.open(path, "wt") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n1 1 1\n1 1 1\n")
    with pytest.raises(ValueError, match="not bgzipped"):
        index.build_mmutil_index(path)


def test_block_read_matches_dense(mtx_file, rng):
    path, idx_path, dens = mtx_file
    tab = index.read_mmutil_index(idx_path)
    N = dens.shape[1]
    for lo, hi in [(0, 3), (5, 6), (100, N)]:
        beg = int(tab[lo])
        end = int(tab[hi]) if hi < N else 0
        rows, cols, vals = mtx.read_mtx_block(path, beg, end)
        got = np.zeros((dens.shape[0], hi - lo), np.float32)
        got[rows, cols - lo] = vals
        assert np.array_equal(got, dens[:, lo:hi])
        if native.available():
            r2, c2, v2 = native.read_block(path, beg, end)
            assert np.array_equal(rows, r2)
            assert np.array_equal(cols, c2)
            assert np.array_equal(vals, v2)


def test_write_read_data_file(tmp_path, rng):
    m = rng.normal(size=(7, 3)).astype(np.float32)
    path = str(tmp_path / "m.gz")
    writers.write_data_file(path, m)
    back = writers.read_data_file(path)
    np.testing.assert_allclose(back, m, rtol=1e-4, atol=1e-6)


def test_write_vector_file(tmp_path):
    path = str(tmp_path / "v.gz")
    writers.write_vector_file(path, [1.5, 2.0, 1e6])
    lines = writers.read_vector_file(path)
    assert lines == ["1.5", "2", "1e+06"]  # C++ ostream default formatting


def test_mtx_writer_is_column_sorted_and_indexable(tmp_path, rng):
    D, N = 10, 30
    rr, cc, vv, dens = make_count_matrix(rng, D, N)
    # shuffle triplets; writer must re-sort by column
    p = rng.permutation(len(vv))
    path = str(tmp_path / "o.mtx.gz")
    writers.write_matrix_market_file(path, rr[p], cc[p], vv[p], (D, N))
    idx = index.build_mmutil_index(path)
    tab = index.read_mmutil_index(idx)
    assert len(tab) == N
    assert index.check_index_tab(path, tab)


def test_native_read_csc_skips_out_of_bounds_rows(tmp_path):
    """Corrupt row indices must be dropped by the native CSC reader
    (downstream dense/ELL fills write at rows[j] unchecked)."""
    from mmvae_tpu.io import native
    from mmvae_tpu.io.bgzf import BgzfWriter

    if not native.available():
        import pytest
        pytest.skip("native extension unavailable")
    path = str(tmp_path / "bad.mtx.gz")
    w = BgzfWriter(path)
    w.write(b"%%MatrixMarket matrix coordinate integer general\n")
    w.write(b"3 2 5\n")
    # rows 1..3 valid; row 9 and row 0 are out of bounds / invalid
    w.write(b"1 1 5\n9 1 7\n3 1 2\n2 2 4\n0 2 9\n")
    w.close()
    got = native.read_csc(path, 2)
    assert got is not None
    rows, vals, indptr, stats = got
    assert rows.tolist() == [0, 2, 1]      # OOB triplets dropped
    assert vals.tolist() == [5.0, 2.0, 4.0]
    assert indptr.tolist() == [0, 2, 3]


def test_truncated_bgzf_fails_cleanly(tmp_path):
    """A truncated BGZF file raises instead of hanging or crashing."""
    import pytest

    from mmvae_tpu.io.bgzf import BgzfWriter
    from mmvae_tpu.io.mtx import peek_mtx_header

    path = str(tmp_path / "trunc.mtx.gz")
    w = BgzfWriter(path)
    w.write(b"%%MatrixMarket matrix coordinate integer general\n")
    w.write(b"10 10 1\n1 1 1\n")
    w.close()
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 3])
    with pytest.raises(Exception):
        peek_mtx_header(path)


def test_consecutive_empty_columns_read_safely(tmp_path):
    """A run of >=2 interior empty columns used to leave MISSING (0)
    voffsets after the reference's single-step forward fill; reads then
    started at the FILE START and parsed the size line as a triplet,
    silently corrupting batches.  The completed fill must return zeros
    for the empty columns and exact data elsewhere."""
    from mmvae_tpu.data import MtxDataBlock
    from mmvae_tpu.io.writers import write_matrix_market_file

    D, N = 4, 6
    dens = np.zeros((D, N), np.float32)
    dens[:, 0] = [1, 0, 2, 0]
    dens[:, 1] = [0, 3, 0, 0]
    # columns 2 and 3 empty (interior run of 2)
    dens[:, 4] = [0, 0, 0, 4]
    dens[:, 5] = [5, 0, 0, 6]
    rr, cc = np.nonzero(dens)
    path = str(tmp_path / "gap.mtx.gz")
    write_matrix_market_file(path, rr, cc, dens[rr, cc], (D, N))
    idx = index.build_mmutil_index(path)
    tab = index.read_mmutil_index(idx)
    assert not (tab == index.MISSING_POS).any()

    db = MtxDataBlock(path, idx, 6)
    got = db.read(np.arange(6))
    assert np.array_equal(got, dens.T)
    # wrap-around with the empty run and the last column together
    db.clear()
    got = db.read(np.array([2, 3, 5, 2, 3, 0]))
    assert np.array_equal(got, dens[:, [2, 3, 5, 2, 3, 0]].T)


def test_native_read_csc_threaded_matches_serial(tmp_path, rng):
    """The range-parallel CSC read (column-index partition, private
    readers, ordered merge) is BITWISE equal to the serial one-pass
    reader for any thread count, on a file with mid-file comments and
    duplicate (row, col) entries."""
    from mmvae_tpu.io.writers import write_matrix_market_file
    from mmvae_tpu.io.index import build_mmutil_index

    if not native.available():
        pytest.skip("native extension unavailable")
    D, N = 23, 301
    rr, cc, vv, dens = make_count_matrix(rng, D, N)
    # inject duplicate entries for a few columns (kept column-sorted)
    dup = np.flatnonzero(cc % 37 == 0)[:25]
    rr = np.concatenate([rr, rr[dup]])
    cc = np.concatenate([cc, cc[dup]])
    vv = np.concatenate([vv, vv[dup]])
    order = np.lexsort((rr, cc))
    path = str(tmp_path / "dup.mtx.gz")
    write_matrix_market_file(path, rr[order], cc[order], vv[order], (D, N))
    # splice mid-file comment lines in by rewriting with comments
    from mmvae_tpu.io.bgzf import BgzfReader, BgzfWriter

    with BgzfReader(path) as r:
        payload = r.read_all().splitlines()
    path2 = str(tmp_path / "dupc.mtx.gz")
    w = BgzfWriter(path2)
    for i, ln in enumerate(payload):
        w.write(ln + b"\n")
        if i in (40, 200):
            w.write(b"% a mid-file comment\n")
    w.close()
    idx = build_mmutil_index(path2)

    ref = native.read_csc(path2, N)
    assert ref is not None
    for nthreads in (2, 3, 7):
        got = native.read_csc_threaded(path2, N, D, idx,
                                       nthreads=nthreads)
        assert got is not None, f"nthreads={nthreads}"
        for a, b, name in zip(got[:3], ref[:3],
                              ("rows", "vals", "indptr")):
            np.testing.assert_array_equal(a, b, err_msg=name)
        assert got[3] == ref[3]
    # nthreads=1 is "not applicable" — callers use the serial reader
    assert native.read_csc_threaded(path2, N, D, idx, nthreads=1) is None


def test_native_read_csc_threaded_rejects_bad_index(tmp_path, rng):
    """An index that disagrees with the file (offsets pointing at the
    wrong columns) must make the threaded reader bail out (None) so the
    caller falls back to the serial pass — never a silent mis-merge."""
    from mmvae_tpu.io.writers import write_matrix_market_file
    from mmvae_tpu.io.index import build_mmutil_index

    if not native.available():
        pytest.skip("native extension unavailable")
    D, N = 11, 97
    rr, cc, vv, dens = make_count_matrix(rng, D, N)
    path = str(tmp_path / "ok.mtx.gz")
    write_matrix_market_file(path, rr, cc, vv, (D, N))
    idx = build_mmutil_index(path)
    # corrupt the index: shift every recorded column up by 30
    pairs = []
    with gzip.open(idx, "rt") as f:
        for ln in f:
            c, off = ln.split()
            pairs.append((int(c), int(off)))
    bad = str(tmp_path / "bad.index")
    with gzip.open(bad, "wt") as f:
        for c, off in pairs:
            f.write(f"{min(c + 30, N - 1)}\t{off}\n")
    got = native.read_csc_threaded(path, N, D, bad, nthreads=4)
    assert got is None
