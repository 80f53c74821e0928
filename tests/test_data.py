"""Tests for the minibatch memory layer (data blocks + pipeline)."""

import numpy as np
import pytest

from mmvae_tpu.data import (
    MtxDataBlock,
    MtxMemoryBlock,
    create_ones_like,
    find_consecutive_blocks,
    PrefetchLoader,
    sequential_batches,
)
from mmvae_tpu.io.index import build_mmutil_index, read_mmutil_index


def test_find_consecutive_blocks_gap():
    tab = np.arange(100, dtype=np.int64) * 1000 + 7
    blocks = find_consecutive_blocks(tab, [0, 1, 2, 50, 55, 99], gap=10)
    assert [(b.lb, b.ub) for b in blocks] == [(0, 3), (50, 56), (99, 100)]
    assert blocks[0].lb_mem == tab[0]
    assert blocks[0].ub_mem == tab[3]
    assert blocks[2].ub_mem == 0  # LAST_POS: read to EOF


def test_data_block_matches_dense(mtx_file, rng):
    path, idx, dens = mtx_file
    B = 16
    db = MtxDataBlock(path, idx, B)
    assert db.dim() == dens.shape
    for _ in range(5):
        sub = rng.integers(0, dens.shape[1], size=B)
        db.clear()
        got = db.read(sub)
        assert np.array_equal(got, dens[:, sub].T)


def test_data_block_duplicates(mtx_file):
    path, idx, dens = mtx_file
    db = MtxDataBlock(path, idx, 6)
    sub = np.array([3, 3, 3, 7, 7, 100])
    db.clear()
    got = db.read(sub)
    assert np.array_equal(got, dens[:, sub].T)


def test_read_batch_thread_invariant(mtx_file, monkeypatch):
    """The native streaming reader decodes a batch's block ranges across
    N threads (each with its own BGZF reader + z_stream) into the shared
    output; the result must be identical for any thread count.  The
    batch is duplicate-heavy and column-scattered (several coalesced
    ranges), and the file carries %%-comment header lines."""
    from mmvae_tpu.io import native

    if not native.available():
        pytest.skip("native extension unavailable")
    path, idx, dens = mtx_file
    sub = np.array([3, 3, 3, 7, 7, 50, 50, 50, 51, 52, 90, 90,
                    100, 100, 100, 119, 0, 1, 2, 10, 30, 30, 60, 61])
    db = MtxDataBlock(path, idx, len(sub))
    outs = {}
    for n in (1, 4):
        monkeypatch.setenv("MMVAE_DECODE_THREADS", str(n))
        db.clear()
        outs[n] = db.read(sub).copy()
    assert np.array_equal(outs[1], outs[4])
    assert np.array_equal(outs[1], dens[:, sub].T)


def test_memory_block_equivalence(mtx_file, rng):
    """Out-of-core block == in-memory block on random subsets — the
    property the reference implicitly relies on but never asserts
    (SURVEY §4)."""
    path, idx, dens = mtx_file
    B = 13
    db = MtxDataBlock(path, idx, B)
    mb = MtxMemoryBlock(path, idx, B)
    for _ in range(5):
        sub = rng.integers(0, dens.shape[1], size=B)
        db.clear()
        mb.clear()
        a = db.read(sub).copy()
        b = mb.read(sub).copy()
        assert np.array_equal(a, b)
        assert np.array_equal(a, dens[:, sub].T)


def test_create_ones_like(mtx_file, tmp_path):
    path, idx, dens = mtx_file
    db = MtxDataBlock(path, idx, 4)
    cov_path = str(tmp_path / "covar.mtx.gz")
    create_ones_like(db, cov_path)
    cov_idx = build_mmutil_index(cov_path)
    cb = MtxDataBlock(cov_path, cov_idx, 4)
    assert cb.dim() == (1, dens.shape[1])
    got = cb.read([0, 5, 119, 5])
    assert np.array_equal(got, np.ones((4, 1), np.float32))


def test_sequential_batches_wraparound():
    batches = sequential_batches(10, 4)
    assert len(batches) == 3
    assert batches[0].tolist() == [0, 1, 2, 3]
    assert batches[2].tolist() == [8, 9, 0, 1]  # wrap-around, mmvae_alg.hh:261-266


def test_memory_block_read_into_stateless(mtx_file, rng):
    path, idx, dens = mtx_file
    B = 9
    mb = MtxMemoryBlock(path, idx, B)
    sub = rng.integers(0, dens.shape[1], size=B)
    out = mb.read_into(sub, np.zeros((B, mb.nfeature()), np.float32))
    assert np.array_equal(out, dens[:, sub].T)
    # shared buffer untouched
    assert not mb.array.any()
    # duplicates + out-of-range columns
    sub2 = np.array([2, 2, 2, 5, 5, 0, dens.shape[1] + 7, 1, 1])
    out2 = mb.read_into(sub2, np.zeros((B, mb.nfeature()), np.float32))
    expect = np.zeros_like(out2)
    ok = sub2 < dens.shape[1]
    expect[ok] = dens[:, sub2[ok]].T
    assert np.array_equal(out2, expect)


def test_prefetch_loader_threaded_memory_block(mtx_file):
    """Round-1 race: a 4-worker loader over MtxMemoryBlock corrupted
    batches via the shared buffer.  read_into makes it batch-exact."""
    path, idx, dens = mtx_file
    B = 10
    db = MtxMemoryBlock(path, idx, B)
    cb = MtxMemoryBlock(path, idx, B)
    batches = sequential_batches(dens.shape[1], B)
    loader = PrefetchLoader(db, cb, batches, depth=3, workers=4)
    seen = 0
    for batch, x, c in loader:
        assert np.array_equal(x, dens[:, batch].T)
        assert np.array_equal(c, dens[:, batch].T)
        seen += 1
    assert seen == len(batches)


def test_prefetch_loader_foreign_block_serialized(mtx_file):
    """Blocks without read_into fall back to a lock-serialized
    clear/read/copy and must still be batch-exact under 4 workers."""
    path, idx, dens = mtx_file
    B = 10

    class ForeignBlock:
        def __init__(self):
            self._mb = MtxMemoryBlock(path, idx, B)

        def size(self):
            return self._mb.size()

        def nfeature(self):
            return self._mb.nfeature()

        def clear(self):
            self._mb.clear()

        def read(self, sub):
            return self._mb.read(sub)

    db = ForeignBlock()
    cb = ForeignBlock()
    batches = sequential_batches(dens.shape[1], B)
    for batch, x, c in PrefetchLoader(db, cb, batches, depth=3, workers=4):
        assert np.array_equal(x, dens[:, batch].T)
        assert np.array_equal(c, dens[:, batch].T)


def test_prefetch_loader(mtx_file):
    path, idx, dens = mtx_file
    B = 10
    db = MtxDataBlock(path, idx, B)
    cb = MtxMemoryBlock(path, idx, B)
    batches = sequential_batches(dens.shape[1], B)
    loader = PrefetchLoader(db, cb, batches, depth=3)
    n = 0
    for batch, x, c in loader:
        assert np.array_equal(x, dens[:, batch].T)
        assert np.array_equal(c, dens[:, batch].T)
        n += 1
    assert n == len(batches)


def test_native_read_csc_matches_python(mtx_file):
    """The one-pass native CSC reader agrees with the triplet+lexsort
    path on arrays, stats, and the ELL fill."""
    from mmvae_tpu.io import native
    from mmvae_tpu.io.mtx import header_end_voffset, read_mtx_block, LAST_POS

    if not native.available():
        import pytest
        pytest.skip("native extension unavailable")
    path, idx, dens = mtx_file
    N = dens.shape[1]
    got = native.read_csc(path, N)
    assert got is not None
    rows, vals, indptr, stats = got
    # reference CSC via the triplet path
    r0, c0, v0 = read_mtx_block(path, header_end_voffset(path), LAST_POS)
    order = np.lexsort((r0, c0))
    np.testing.assert_array_equal(rows, r0[order])
    np.testing.assert_array_equal(vals, v0[order])
    counts = np.bincount(c0, minlength=N)
    ref_indptr = np.zeros(N + 1, np.int64)
    np.cumsum(counts, out=ref_indptr[1:])
    np.testing.assert_array_equal(indptr, ref_indptr)
    assert stats["k_max"] == int(counts.max())
    assert stats["vmax"] == float(v0.max())
    assert stats["integral"] == bool(np.all(v0 == np.trunc(v0)))

    # native ELL fill == numpy ELL fill
    k = stats["k_max"]
    er, ev = native.ell_fill(rows, vals, indptr, k, np.float32)
    ref_rows = np.full((N, k), -1, np.int32)
    ref_vals = np.zeros((N, k), np.float32)
    col_ids = np.repeat(np.arange(N), np.diff(indptr))
    offs = np.arange(len(rows)) - np.repeat(indptr[:-1], np.diff(indptr))
    ref_rows[col_ids, offs] = rows
    ref_vals[col_ids, offs] = vals
    np.testing.assert_array_equal(er, ref_rows)
    np.testing.assert_array_equal(ev, ref_vals)
