"""Plain-gzip and uncompressed MatrixMarket support (in-memory path)."""

import gzip

import numpy as np

from mmvae_tpu.data import MtxMemoryBlock
from mmvae_tpu.io.mtx import read_mtx_any, sniff_format
from tests.conftest import make_count_matrix


def _write_plain(path, rr, cc, vv, shape, compress=False):
    lines = ["%%MatrixMarket matrix coordinate integer general",
             f"{shape[0]} {shape[1]} {len(vv)}"]
    order = np.lexsort((rr, cc))
    for k in order:
        lines.append(f"{rr[k] + 1} {cc[k] + 1} {vv[k]:g}")
    data = ("\n".join(lines) + "\n").encode()
    if compress:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)


def test_sniff_format(tmp_path, rng, mtx_file):
    bgzf_path, _, _ = mtx_file
    assert sniff_format(bgzf_path) == "bgzf"
    rr, cc, vv, dens = make_count_matrix(rng, 10, 20)
    gz = str(tmp_path / "a.mtx.gz")
    plain = str(tmp_path / "a.mtx")
    _write_plain(gz, rr, cc, vv, dens.shape, compress=True)
    _write_plain(plain, rr, cc, vv, dens.shape, compress=False)
    assert sniff_format(gz) == "gz"
    assert sniff_format(plain) == "plain"


def test_read_any_all_formats(tmp_path, rng, mtx_file):
    bgzf_path, _, dens_b = mtx_file
    hdr, rows, cols, vals = read_mtx_any(bgzf_path)
    got = np.zeros((hdr.rows, hdr.cols), np.float32)
    got[rows, cols] = vals
    assert np.array_equal(got, dens_b)

    rr, cc, vv, dens = make_count_matrix(rng, 15, 25)
    for name, compress in [("p.mtx", False), ("p.mtx.gz", True)]:
        path = str(tmp_path / name)
        _write_plain(path, rr, cc, vv, dens.shape, compress)
        hdr, rows, cols, vals = read_mtx_any(path)
        got = np.zeros((15, 25), np.float32)
        got[rows, cols] = vals
        assert np.array_equal(got, dens)


def test_memory_block_plain_gzip(tmp_path, rng):
    rr, cc, vv, dens = make_count_matrix(rng, 15, 25)
    path = str(tmp_path / "m.mtx.gz")
    _write_plain(path, rr, cc, vv, dens.shape, compress=True)
    mb = MtxMemoryBlock(path, batch_size=6)
    got = mb.read(np.array([0, 5, 24, 5, 1, 2]))
    assert np.array_equal(got, dens[:, [0, 5, 24, 5, 1, 2]].T)


def test_fast_parser_numpy2_and_comments():
    """np.fromstring is gone in numpy 2.x; the loadtxt-based fast path
    must parse comment-bearing bodies without demoting to per-line mode
    (reference tolerates mid-file comments, mmutil_bgzf_util.hh:104-109)."""
    import numpy as np
    from mmvae_tpu.io.mtx import _fast_parse_clean, parse_triplet_text

    body = b"1 1 3\n% a mid-file comment\n2 2 4.5\n"
    out = _fast_parse_clean(body)
    assert out is not None, "comment body fell off the fast path"
    r, c, v = out
    assert r.tolist() == [0, 1] and c.tolist() == [0, 1]
    assert np.allclose(v, [3.0, 4.5])

    # ragged/malformed bodies degrade gracefully to the tolerant parser
    r, c, v = parse_triplet_text(b"1 1 3\n2 2\n2 2 bad\n3 3 7\n")
    assert r.tolist() == [0, 2] and v.tolist() == [3.0, 7.0]

    r, c, v = parse_triplet_text(b"")
    assert len(r) == 0 and len(c) == 0 and len(v) == 0


def test_bgzf_reader_handles_extra_subfields(tmp_path):
    """BGZF blocks may carry extra gzip subfields after BC; the reader
    must skip ALL of xlen before the deflate payload (round-2 review:
    the BC-first fast path ignored trailing subfields)."""
    import struct

    from mmvae_tpu.io.bgzf import BGZF_EOF, BgzfReader, BgzfWriter

    path = str(tmp_path / "x.gz")
    w = BgzfWriter(path)
    payload = b"hello subfields\nsecond line\n"
    w.write(payload)
    w.close()
    raw = open(path, "rb").read()
    block = raw[: len(raw) - len(BGZF_EOF)]
    # splice a dummy 'XX' subfield (6 bytes) after the BC subfield
    xlen = struct.unpack_from("<H", block, 10)[0]
    assert xlen == 6
    bsize = struct.unpack_from("<H", block, 16)[0] + 1
    extra = b"XX" + struct.pack("<H", 2) + b"\x00\x00"
    mod = bytearray(block[:18] + extra + block[18:])
    struct.pack_into("<H", mod, 10, xlen + 6)           # new XLEN
    struct.pack_into("<H", mod, 16, bsize + 6 - 1)      # new BSIZE-1
    open(path, "wb").write(bytes(mod) + BGZF_EOF)

    with BgzfReader(path) as r:
        assert r.read_all() == payload
