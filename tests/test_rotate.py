"""Beyond-HBM rotating-shard epochs: bitwise trajectories vs resident.

The rotating tier (Trainer.make_rotating_epoch + data/shards.py) is the
TPU answer to the reference's out-of-core training (mmvae_io.hh:49-141):
when neither resident layout fits the HBM budget, host-resident shards
rotate through HBM.  Values, schedule, and PRNG chain are identical to
the resident paths, so trajectories must match to float tolerance.
"""

import gzip

import numpy as np
import pytest

import jax

from mmvae_tpu.data import MtxDataBlock, MtxMemoryBlock, create_ones_like
from mmvae_tpu.data.shards import ShardStore, _dense_fill_np
from mmvae_tpu.io.index import build_mmutil_index
from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops.losses import nb_loss
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import train_vae_model


@pytest.fixture()
def setup(mtx_file, tmp_path):
    path, idx, dens = mtx_file
    B = 16  # ntot=120 % 16 != 0 -> the schedule wraps (batch 8)
    data = MtxMemoryBlock(path, idx, B)
    cov_path = str(tmp_path / "cov.mtx.gz")
    create_ones_like(data, cov_path)
    cov_idx = build_mmutil_index(cov_path)
    covar = MtxDataBlock(cov_path, cov_idx, B)
    covar.auto_ones = True
    model = NBVAE(data_dim=dens.shape[0], covar_dim=1)
    return data, covar, model


def _force_rotation(monkeypatch, shard_bytes=2000, layout=None):
    """Budget tiny enough that neither resident layout fits; shard
    budget sized for ~3 batches/shard at the conftest matrix."""
    monkeypatch.setenv("MMVAE_DENSE_BYTES", "1")
    monkeypatch.setenv("MMVAE_SHARD_BYTES", str(shard_bytes))
    if layout:
        monkeypatch.setenv("MMVAE_SHARD_LAYOUT", layout)


def _train(data, covar, model, ondevice, epochs=3, recorder=None,
           fast_step=None):
    topt = TrainingOptions(nboot=2, max_epoch=epochs, recording=100,
                           superbatch=3, seed=0, auto_ondevice=False)
    params = model.init(jax.random.PRNGKey(0))
    kw = {"fast_step": fast_step} if fast_step is not None else {}
    return train_vae_model(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        recorder, data, covar, topt,
        lambda x, out, beta: nb_loss(x, out, beta),
        params, ondevice=ondevice, **kw,
    )


# ---------------------------------------------------------------- store

def test_shard_plan_covers_schedule(mtx_file):
    path, idx, dens = mtx_file
    blk = MtxMemoryBlock(path, idx, 16)
    store = ShardStore.build(blk, 16, shard_budget=2000)
    assert store.nshards >= 2
    assert sum(s.nb for s in store.shards) == store.nbatch == 8
    assert [s.b0 for s in store.shards] == list(
        np.cumsum([0] + [s.nb for s in store.shards[:-1]])
    )
    # at most two distinct shard sizes -> at most two compiled programs
    assert len({s.nb for s in store.shards}) <= 2


@pytest.mark.parametrize("layout", ["dense", "ell", "csr"])
def test_shard_rows_match_schedule_values(mtx_file, layout):
    """Every batch of every shard reproduces the host loader's dense
    batch — including the final wrap-around batch."""
    from mmvae_tpu.ops.densify import densify_gathered, densify_triplets

    path, idx, dens = mtx_file
    B = 16
    blk = MtxMemoryBlock(path, idx, B)
    store = ShardStore.build(blk, B, shard_budget=2000, layout=layout)
    ntot = dens.shape[1]
    for sh in store.shards:
        dev = store.put(store.shards.index(sh))
        for i in range(sh.nb):
            b = sh.b0 + i
            cols = (b * B + np.arange(B)) % ntot
            want = dens[:, cols].T
            if layout == "dense":
                got = np.asarray(dev[0][i * B:(i + 1) * B])
            elif layout == "csr":
                got = np.asarray(densify_triplets(
                    dev[0][i], dev[1][i], dev[2][i], B, store.D))
            else:
                got = np.asarray(densify_gathered(
                    dev[0][i * B:(i + 1) * B],
                    dev[1][i * B:(i + 1) * B], store.D))
            np.testing.assert_array_equal(got.astype(np.float32), want)


def test_dense_fill_np_matches_native(mtx_file):
    from mmvae_tpu.io import native

    if not native.available():
        pytest.skip("native extension unavailable")
    path, idx, dens = mtx_file
    blk = MtxMemoryBlock(path, idx, 16)
    rows, vals, indptr = blk.csc_arrays()
    vd = getattr(blk, "val_dtype", np.float32)
    ids = (np.arange(96, 128) % dens.shape[1]).astype(np.int64)  # wraps
    a = native.dense_fill(rows, vals, indptr, blk.nfeature(), vd, ids)
    b = _dense_fill_np(rows, vals, indptr, blk.nfeature(), vd, ids)
    np.testing.assert_array_equal(a, b)


def test_pinned_shards_spread_and_cached(mtx_file):
    """Pinning: the pin budget converts shards to HBM-resident ones at
    evenly spread positions, and put() caches them."""
    path, idx, dens = mtx_file
    blk = MtxMemoryBlock(path, idx, 16)
    store = ShardStore.build(blk, 16, shard_budget=700,  # 1 batch/shard
                             pin_budget=100000)
    R = store.nshards
    assert R == 8
    # pin budget covers everything but at least one shard must rotate
    assert len(store.pinned_idx) == R - 1
    p = next(iter(store.pinned_idx))
    assert store.put(p) is store.put(p)          # cached
    rot = [r for r in range(R) if r not in store.pinned_idx]
    assert store.put(rot[0]) is not store.put(rot[0])  # fresh each time

    store2 = ShardStore.build(blk, 16, shard_budget=700,
                              pin_budget=4 * store.shard_bytes(0))
    rot2 = sorted(set(range(store2.nshards)) - store2.pinned_idx)
    assert len(rot2) == store2.nshards - 4
    gaps = np.diff(rot2 + [rot2[0] + store2.nshards])
    assert gaps.max() - gaps.min() <= 1  # evenly spread


def test_rotation_pinned_matches_resident(setup, monkeypatch):
    """Hybrid pinned+rotating epochs: trajectory equality holds with
    part of the shards HBM-cached."""
    data, covar, model = setup
    p_res, l_res = _train(data, covar, model, ondevice=True)
    _force_rotation(monkeypatch)
    monkeypatch.setenv("MMVAE_PIN_BYTES", "4000")  # pins ~2 of 4 shards
    p_rot, l_rot = _train(data, covar, model, ondevice=True)
    np.testing.assert_allclose(l_res, l_rot, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_res),
                    jax.tree_util.tree_leaves(p_rot)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


# ------------------------------------------------------------ trajectory

def test_rotation_matches_resident_trajectory(setup, monkeypatch):
    data, covar, model = setup
    p_res, l_res = _train(data, covar, model, ondevice=True)
    _force_rotation(monkeypatch)
    p_rot, l_rot = _train(data, covar, model, ondevice=True)
    np.testing.assert_allclose(l_res, l_rot, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_res),
                    jax.tree_util.tree_leaves(p_rot)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("layout", ["ell", "csr"])
def test_rotation_layout_matches_host(setup, monkeypatch, layout):
    data, covar, model = setup
    p_host, l_host = _train(data, covar, model, ondevice=False)
    _force_rotation(monkeypatch, layout=layout)
    p_rot, l_rot = _train(data, covar, model, ondevice=True)
    np.testing.assert_allclose(l_host, l_rot, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_host),
                    jax.tree_util.tree_leaves(p_rot)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_rotation_single_shard_degenerates_to_resident(setup, monkeypatch):
    """A huge shard budget yields R=1 and must still work (the carry
    prefetch short-circuits)."""
    data, covar, model = setup
    p_res, l_res = _train(data, covar, model, ondevice=True)
    _force_rotation(monkeypatch, shard_bytes=1 << 30)
    p_rot, l_rot = _train(data, covar, model, ondevice=True)
    np.testing.assert_allclose(l_res, l_rot, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_res),
                    jax.tree_util.tree_leaves(p_rot)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_rotation_fast_step_vmf(setup, monkeypatch, tmp_path):
    """Fast-step (packed) rotation: the pre-drawn rand slices must hit
    the same global batch ids as the resident epoch."""
    from mmvae_tpu.models.vmf import VMFVAE
    from mmvae_tpu.ops.losses import vmf_loss
    from mmvae_tpu.ops.vmf_fast import VMFFastStep

    data, covar, _ = setup
    model = VMFVAE(data_dim=data.nfeature(), covar_dim=1)
    topt = TrainingOptions(nboot=2, max_epoch=3, recording=100,
                           superbatch=2, seed=0, auto_ondevice=False)

    def run():
        params = model.init(jax.random.PRNGKey(0))
        return train_vae_model(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            None, data, covar, topt,
            lambda x, out, beta: vmf_loss(x, out, beta),
            params, ondevice=True, fast_step=VMFFastStep(model, topt),
        )

    p_res, l_res = run()
    _force_rotation(monkeypatch)
    p_rot, l_rot = run()
    np.testing.assert_allclose(l_res, l_rot, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_res),
                    jax.tree_util.tree_leaves(p_rot)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_rotation_recording_matches_resident(setup, monkeypatch, tmp_path):
    """Recording epochs on the rotating tier: per-shard scan outputs
    concatenate to the same posterior artifacts as the resident path."""
    from mmvae_tpu.train.recorder import LatentRecorder

    data, covar, model = setup

    def run(tag, rotate):
        if rotate:
            _force_rotation(monkeypatch)
        else:
            monkeypatch.delenv("MMVAE_DENSE_BYTES", raising=False)
            monkeypatch.delenv("MMVAE_SHARD_BYTES", raising=False)
        topt = TrainingOptions(nboot=2, max_epoch=2, recording=2,
                               superbatch=3, seed=0, auto_ondevice=False)
        params = model.init(jax.random.PRNGKey(0))
        rec = LatentRecorder(
            str(tmp_path / tag), topt.max_epoch, data.ntot(),
            encode_fn=lambda p, x: model.encode_mu(p, x),
            write_params=False,
        )
        train_vae_model(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            rec, data, covar, topt,
            lambda x, out, beta: nb_loss(x, out, beta),
            params, ondevice=True,
        )

        def load(name):
            f = tmp_path / f"{tag}_1.{name}.gz"
            return np.loadtxt(gzip.open(f, "rt"))

        return load("mu_mean"), load("mu_lnvar")

    m_res, l_res = run("res", False)
    m_rot, l_rot = run("rot", True)
    np.testing.assert_allclose(m_res, m_rot, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(l_res, l_rot, rtol=1e-5, atol=1e-7)


def test_auto_enable_routes_beyond_budget_to_rotation(setup, monkeypatch,
                                                      capsys):
    """auto_ondevice over MMVAE_ONDEVICE_BYTES must pick the rotating
    tier (not the 20x-slower host streaming loop) — WITHOUT the user
    also lowering MMVAE_DENSE_BYTES: the loader must tier on the same
    budget the auto-enable gate used, or a dataset between the two
    budgets would load fully resident despite the log promising
    rotation (round-5 review finding)."""
    data, covar, model = setup
    monkeypatch.setenv("MMVAE_ONDEVICE_BYTES", "1")
    monkeypatch.delenv("MMVAE_DENSE_BYTES", raising=False)
    monkeypatch.setenv("MMVAE_SHARD_BYTES", "2000")
    topt = TrainingOptions(nboot=2, max_epoch=2, recording=100,
                           superbatch=3, seed=0, auto_ondevice=True)
    params = model.init(jax.random.PRNGKey(0))
    _, losses = train_vae_model(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        None, data, covar, topt,
        lambda x, out, beta: nb_loss(x, out, beta),
        params, ondevice=False,
    )
    assert len(losses) == 2
    err = capsys.readouterr().err
    assert "Rotating" in err and "host-resident shards" in err


def test_native_csr_fill_matches_numpy():
    """mmvae_csr_fill (one native pass) must reproduce _csr_fill_np
    bit-for-bit, including the wrap-around schedule, sentinel padding,
    and every dtype combination the store can choose."""
    from mmvae_tpu.data.shards import _csr_fill_np
    from mmvae_tpu.io import native

    if not native.available():
        pytest.skip("native extension unavailable")
    rng = np.random.default_rng(7)
    D, ntot, B = 40, 26, 8
    dens = (rng.random((D, ntot)) < 0.3) * rng.integers(
        1, 100, (D, ntot))
    rr, cc = np.nonzero(dens)
    order = np.argsort(cc, kind="stable")
    rr, cc = rr[order], cc[order]
    vals = dens[rr, cc].astype(np.float32)
    indptr = np.searchsorted(cc, np.arange(ntot + 1)).astype(np.int64)
    rows = rr.astype(np.int32)
    nbatch = -(-ntot // B)
    ids = np.arange(nbatch * B, dtype=np.int64) % ntot
    counts = np.diff(indptr)
    nnz_pad = int(counts[ids].reshape(nbatch, B).sum(axis=1).max()) + 3
    for rbd, cid, vd in [(np.int8, np.int16, np.int8),
                         (np.int16, np.int32, np.float32),
                         (np.int8, np.int32, np.int16)]:
        a = _csr_fill_np(rows, vals, indptr, ids, B, nnz_pad, rbd,
                         cid, vd)
        b = native.csr_fill(rows, vals, indptr, ids, B, nnz_pad, rbd,
                            cid, vd)
        for x, y in zip(a, b):
            assert x.dtype == y.dtype
            np.testing.assert_array_equal(x, y)
