"""On-device epoch path: bit-identical trajectories vs the host path."""

import numpy as np
import pytest

from mmvae_tpu.data import MtxDataBlock, MtxMemoryBlock, create_ones_like
from mmvae_tpu.io.index import build_mmutil_index
from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops.losses import nb_loss
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import train_vae_model

import jax
import jax.numpy as jnp


@pytest.fixture()
def setup(mtx_file, tmp_path):
    path, idx, dens = mtx_file
    B = 16
    data = MtxDataBlock(path, idx, B)
    cov_path = str(tmp_path / "cov.mtx.gz")
    create_ones_like(data, cov_path)
    cov_idx = build_mmutil_index(cov_path)
    covar = MtxDataBlock(cov_path, cov_idx, B)
    covar.auto_ones = True  # as prepare_blocks marks the generated file
    model = NBVAE(data_dim=dens.shape[0], covar_dim=1)
    return data, covar, model


def _train(data, covar, model, ondevice, epochs=3):
    topt = TrainingOptions(nboot=2, max_epoch=epochs, recording=100,
                           superbatch=3, seed=0)
    params = model.init(jax.random.PRNGKey(0))
    params, losses = train_vae_model(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        None, data, covar, topt,
        lambda x, out, beta: nb_loss(x, out, beta),
        params, ondevice=ondevice,
    )
    return params, losses


def test_ondevice_matches_host_trajectory(setup):
    data, covar, model = setup
    p_host, l_host = _train(data, covar, model, ondevice=False)
    p_dev, l_dev = _train(data, covar, model, ondevice=True)
    np.testing.assert_allclose(l_host, l_dev, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_host),
                    jax.tree_util.tree_leaves(p_dev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_ondevice_with_recording(setup, tmp_path):
    """Recording epochs fall back to the host path and still record."""
    from mmvae_tpu.train.recorder import LatentRecorder

    data, covar, model = setup
    topt = TrainingOptions(nboot=1, max_epoch=2, recording=2,
                           superbatch=2, seed=0)
    params = model.init(jax.random.PRNGKey(0))
    rec = LatentRecorder(str(tmp_path / "hdr"), 2, data.ntot(),
                         encode_fn=lambda p, x: model.encode_mu(p, x))
    params, losses = train_vae_model(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        rec, data, covar, topt,
        lambda x, out, beta: nb_loss(x, out, beta),
        params, ondevice=True,
    )
    assert len(losses) == 2
    assert (tmp_path / "hdr_1.mu_mean.gz").exists()


def test_ondevice_recording_matches_host(setup, tmp_path):
    """Recording epochs on the on-device path produce the same latent
    posterior artifacts as the per-batch host path."""
    import gzip

    from mmvae_tpu.train.recorder import LatentRecorder

    data, covar, model = setup

    def run(ondevice, tag):
        topt = TrainingOptions(nboot=2, max_epoch=2, recording=2,
                               superbatch=3, seed=0,
                               auto_ondevice=False)
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
            params, ondevice=ondevice,
        )
        def load(name):
            f = tmp_path / f"{tag}_1.{name}.gz"
            return np.loadtxt(gzip.open(f, "rt"))
        return load("mu_mean"), load("mu_lnvar")

    mh, lh = run(False, "host")
    md, ld = run(True, "dev")
    np.testing.assert_allclose(mh, md, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(lh, ld, rtol=1e-5, atol=1e-7)


def test_ondevice_async_recorder_matches_sync(setup, tmp_path):
    """The CLI's async recorder (deferred ingest+writes on the writer
    thread, packed one-transfer param fetch) produces byte-identical
    artifacts to the synchronous recorder."""
    import gzip

    from mmvae_tpu.train.recorder import LatentRecorder

    data, covar, model = setup

    def run(async_writes, tag):
        topt = TrainingOptions(nboot=2, max_epoch=4, recording=2,
                               superbatch=3, seed=0)
        params = model.init(jax.random.PRNGKey(0))
        rec = LatentRecorder(
            str(tmp_path / tag), topt.max_epoch, data.ntot(),
            encode_fn=lambda p, x: model.encode_mu(p, x),
            async_writes=async_writes,
        )
        train_vae_model(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            rec, data, covar, topt,
            lambda x, out, beta: nb_loss(x, out, beta),
            params, ondevice=True,
        )
        rec.flush()

    run(False, "sync")
    run(True, "async")
    import glob
    import os

    sync_files = sorted(glob.glob(str(tmp_path / "sync_*.gz")))
    assert sync_files, "sync recorder wrote nothing"
    for f in sync_files:
        g = f.replace(os.sep + "sync_", os.sep + "async_")
        assert os.path.exists(g), f"missing async artifact {g}"
        with gzip.open(f, "rb") as fa, gzip.open(g, "rb") as fb:
            assert fa.read() == fb.read(), f"artifact mismatch: {f}"


def test_ondevice_ell_mode_matches_dense(setup, monkeypatch):
    """Force the ELL layout (dense budget 0) and check the trajectory
    matches both the dense-resident mode and the host path."""
    data, covar, model = setup
    p_host, l_host = _train(data, covar, model, ondevice=False)
    monkeypatch.setenv("MMVAE_DENSE_BYTES", "0")
    monkeypatch.setenv("MMVAE_ROTATE", "0")  # ELL, not the shard tier
    p_ell, l_ell = _train(data, covar, model, ondevice=True)
    monkeypatch.delenv("MMVAE_DENSE_BYTES")
    monkeypatch.delenv("MMVAE_ROTATE")
    p_dense, l_dense = _train(data, covar, model, ondevice=True)
    np.testing.assert_allclose(l_host, l_ell, rtol=1e-6)
    np.testing.assert_allclose(l_ell, l_dense, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ell),
                    jax.tree_util.tree_leaves(p_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_ondevice_dp_matches_host_dp(mtx_file, tmp_path):
    """DP x on-device epochs (device-major dense layout under
    shard_map) reproduce the dp_shard host-loop trajectory."""
    from mmvae_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    path, idx, dens = mtx_file
    B = 24  # ntot=120 % 24 == 0 (wrap-free), 24 % 8 == 0
    data = MtxMemoryBlock(path, idx, B)
    cov_path = str(tmp_path / "cov.mtx.gz")
    create_ones_like(data, cov_path)
    cov_idx = build_mmutil_index(cov_path)
    covar = MtxMemoryBlock(cov_path, cov_idx, B)
    covar.auto_ones = True
    model = NBVAE(data_dim=dens.shape[0], covar_dim=1)

    def run(ondevice):
        topt = TrainingOptions(nboot=2, max_epoch=3, recording=100,
                               superbatch=2, seed=0, auto_ondevice=False)
        params = model.init(jax.random.PRNGKey(0))
        return train_vae_model(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            None, data, covar, topt,
            lambda x, out, beta: nb_loss(x, out, beta),
            params, mesh=make_mesh(), dp_shard_map=True,
            ondevice=ondevice,
        )

    p_host, l_host = run(False)
    p_dev, l_dev = run(True)
    np.testing.assert_allclose(l_host, l_dev, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_host),
                    jax.tree_util.tree_leaves(p_dev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_ondevice_tp_matches_host_tp(mtx_file, tmp_path):
    """TP x on-device epochs (dense data sharded over ('data','model')
    under the 2-D shard_map) reproduce the host TP trajectory
    (VERDICT r2 item 4)."""
    from mmvae_tpu.ops import nb_step
    from mmvae_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    path, idx, dens = mtx_file
    D = dens.shape[0]
    B = 24  # ntot=120 % 24 == 0 (wrap-free), 24 % 2 (data axis) == 0
    data = MtxMemoryBlock(path, idx, B)
    cov_path = str(tmp_path / "cov.mtx.gz")
    create_ones_like(data, cov_path)
    cov_idx = build_mmutil_index(cov_path)
    covar = MtxMemoryBlock(cov_path, cov_idx, B)
    covar.auto_ones = True
    model = NBVAE(data_dim=D, covar_dim=1, mean_latent=2)

    old = nb_step._INTERPRET
    nb_step._INTERPRET = True  # run the real Pallas kernels on CPU
    try:
        mesh = make_mesh(model_parallel=2, devices=jax.devices()[:4])

        def run(ondevice):
            topt = TrainingOptions(nboot=2, max_epoch=3, recording=100,
                                   superbatch=2, seed=0,
                                   auto_ondevice=False)
            params = model.init(jax.random.PRNGKey(0))
            return train_vae_model(
                lambda p, x, c, k, t: None,
                None, data, covar, topt,
                lambda x, out, beta: None,
                params, mesh=mesh, tp_shard_map=True, data_dim=D,
                tp_param_pspecs=model.tp_pspecs(params),
                report_loss_override=lambda p, x, c, k, b:
                    model.fused_step_report_tp(p, x, c, k, b),
                boot_loss_override=lambda p, x, c, k, b:
                    model.fused_step_boot_tp(p, x, c, k, b),
                ondevice=ondevice,
            )

        p_host, l_host = run(False)
        p_dev, l_dev = run(True)
    finally:
        nb_step._INTERPRET = old
    np.testing.assert_allclose(l_host, l_dev, rtol=1e-6)
    leaves_host = dict(jax.tree_util.tree_leaves_with_path(p_host))
    for kpath, leaf in jax.tree_util.tree_leaves_with_path(p_dev):
        ref = np.asarray(leaves_host[kpath])
        scale = max(1e-3, float(np.abs(ref).max()))
        np.testing.assert_allclose(
            np.asarray(leaf), ref, rtol=1e-5, atol=1e-6 * scale,
            err_msg=f"TP ondevice/host mismatch at "
                    f"{jax.tree_util.keystr(kpath)}",
        )


def test_superbatch_record_matches_perbatch(setup, tmp_path, monkeypatch):
    """The scan-collected recording path (Trainer.step_record) writes the
    same artifacts as the legacy one-batch-per-dispatch recorder loop."""
    import gzip

    from mmvae_tpu.train.loop import Trainer
    from mmvae_tpu.train.recorder import LatentRecorder

    data, covar, model = setup

    def run(tag, force_slow):
        if force_slow:
            monkeypatch.setattr(Trainer, "can_step_record",
                                lambda self, needs_extra=False: False)
        else:
            monkeypatch.undo()
        topt = TrainingOptions(nboot=2, max_epoch=2, recording=1,
                               superbatch=3, seed=0,
                               auto_ondevice=False)
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
            params, ondevice=False,
        )

        def load(name):
            f = tmp_path / f"{tag}_1.{name}.gz"
            return np.loadtxt(gzip.open(f, "rt"))

        return load("mu_mean"), load("mu_lnvar")

    ms, ls = run("slowrec", True)
    mf, lf = run("fastrec", False)
    np.testing.assert_allclose(mf, ms, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(lf, ls, rtol=1e-5, atol=1e-7)


def test_ondevice_vmf_fast_step_with_recording(setup, tmp_path):
    """vMF fast step x on-device epochs x recording: trajectory matches
    the generic host path, and recording epochs (which unpack the
    packed state per batch for the encoder) produce the artifacts."""
    from mmvae_tpu.models.vmf import VMFVAE
    from mmvae_tpu.ops.losses import vmf_loss
    from mmvae_tpu.ops.vmf_fast import VMFFastStep
    from mmvae_tpu.train.recorder import LatentRecorder

    data, covar, model_nb = setup
    model = VMFVAE(data_dim=data.nfeature(), covar_dim=1)
    topt = TrainingOptions(nboot=2, max_epoch=2, recording=2,
                           superbatch=2, seed=0)

    results = []
    for fast, ondevice in ((False, False), (True, True)):
        params = model.init(jax.random.PRNGKey(0))
        rec = LatentRecorder(
            str(tmp_path / ("fast" if fast else "gen")), 2, data.ntot(),
            encode_fn=lambda p, x: model.encode(p, x),
            mean_name="latent_mean", lnvar_name="latent_lnvar",
        )
        kw = {}
        if fast:
            kw["fast_step"] = VMFFastStep(model, topt)
        params, losses = train_vae_model(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            rec, data, covar, topt,
            lambda x, out, beta: vmf_loss(x, out, beta),
            params, ondevice=ondevice, **kw,
        )
        results.append((params, losses))
    (p_gen, l_gen), (p_fast, l_fast) = results
    np.testing.assert_allclose(l_fast, l_gen, rtol=2e-5)
    assert (tmp_path / "fast_1.latent_mean.gz").exists()
    import gzip

    a = np.loadtxt(gzip.open(tmp_path / "fast_1.latent_mean.gz"))
    b = np.loadtxt(gzip.open(tmp_path / "gen_1.latent_mean.gz"))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_ondevice_dp_fast_step_vmf(mtx_file, tmp_path):
    """vMF fast step x DP x on-device epochs: the shard_map rand specs
    must follow the fast step's own draw structure (regression: an
    NB-shaped hardcoded spec dict crashed this path), and the
    trajectory must match the dp_shard host loop."""
    from mmvae_tpu.models.vmf import VMFVAE
    from mmvae_tpu.ops.losses import vmf_loss
    from mmvae_tpu.ops.vmf_fast import VMFFastStep
    from mmvae_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    path, idx, dens = mtx_file
    B = 24  # ntot=120 % 24 == 0 (wrap-free), 24 % 8 == 0
    data = MtxMemoryBlock(path, idx, B)
    cov_path = str(tmp_path / "cov.mtx.gz")
    create_ones_like(data, cov_path)
    cov_idx = build_mmutil_index(cov_path)
    covar = MtxMemoryBlock(cov_path, cov_idx, B)
    covar.auto_ones = True
    model = VMFVAE(data_dim=dens.shape[0], covar_dim=1)

    def run(ondevice):
        topt = TrainingOptions(nboot=2, max_epoch=3, recording=100,
                               superbatch=2, seed=0, auto_ondevice=False)
        params = model.init(jax.random.PRNGKey(0))
        return train_vae_model(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            None, data, covar, topt,
            lambda x, out, beta: vmf_loss(x, out, beta),
            params, mesh=make_mesh(), dp_shard_map=True,
            ondevice=ondevice, fast_step=VMFFastStep(model, topt),
        )

    p_host, l_host = run(False)
    p_dev, l_dev = run(True)
    np.testing.assert_allclose(l_host, l_dev, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_host),
                    jax.tree_util.tree_leaves(p_dev)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_fetch_params_leaves_no_device_refs(tmp_path):
    """_fetch_params must fetch EVERY device leaf (not just packable
    f32 ones): submit_epoch hands the result to the writer thread
    while the next epoch's dispatch donates the live param buffers —
    a surviving device reference would read a deleted array."""
    from mmvae_tpu.train.recorder import LatentRecorder

    rec = LatentRecorder(str(tmp_path / "hdr"), 2, 4,
                         encode_fn=lambda p, x: x)
    params = {
        "w": jnp.ones((3, 2), jnp.float32),          # packable
        "steps": jnp.asarray(7, jnp.int32),          # non-f32 device
        "host": np.zeros(2, np.float32),             # host passthrough
    }
    out = rec._fetch_params(params)
    assert not any(isinstance(a, jax.Array)
                   for a in jax.tree_util.tree_leaves(out))
    np.testing.assert_array_equal(out["w"], np.ones((3, 2)))
    assert out["steps"] == 7
    assert out["host"] is params["host"]


def test_stage_params_snapshot_and_no_packable(tmp_path):
    """Round-4 review regressions: (a) a tree with NO packable f32
    device leaf must stage/fetch without crashing; (b) a staged handle
    must keep its own packer indices — a later stage with a different
    leaf set must not corrupt an earlier pending handle."""
    from mmvae_tpu.train.recorder import LatentRecorder

    rec = LatentRecorder(str(tmp_path / "hdr"), 2, 4,
                         encode_fn=lambda p, x: x)
    # (a) no packable leaf
    out = rec._fetch_params({"host": np.zeros(2, np.float32),
                             "n": jnp.asarray(3, jnp.int32)})
    assert out["n"] == 3 and isinstance(out["host"], np.ndarray)

    # (b) interleaved stages with different packable leaf sets
    p1 = {"a": jnp.ones((2, 3), jnp.float32),
          "b": jnp.full((4,), 2.0, jnp.float32)}
    staged1 = rec._stage_params(p1)
    p2 = {"a": jnp.full((5,), 4.0, jnp.float32)}  # different key set
    staged2 = rec._stage_params(p2)  # rebinds rec._packer_idx
    out1 = rec._finish_params(staged1)
    out2 = rec._finish_params(staged2)
    np.testing.assert_array_equal(out1["a"], np.ones((2, 3)))
    np.testing.assert_array_equal(out1["b"], np.full((4,), 2.0))
    np.testing.assert_array_equal(out2["a"], np.full((5,), 4.0))
