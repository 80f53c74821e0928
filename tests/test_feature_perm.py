"""Feature-clustering permutation: canonical artifacts, close trajectory.

The dense-resident kernel path may reorder genes cold-first so hot
counts (>7) cluster into few lane tiles (train/loop.py feature_perm).
The permutation must be invisible outside the training loop: returned
params, recorded artifacts, and checkpoints stay in input gene order,
and the trajectory differs from the unpermuted run only by floating-
point reassociation.
"""

import gzip

import numpy as np
import pytest

import jax

from mmvae_tpu.data import MtxDataBlock, MtxMemoryBlock, create_ones_like
from mmvae_tpu.io.index import build_mmutil_index
from mmvae_tpu.io.writers import write_matrix_market_file
from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops.losses import nb_loss
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import train_vae_model


@pytest.fixture()
def hot_setup(tmp_path):
    """Small matrix with a few HOT genes (counts > 7) scattered in."""
    rng = np.random.default_rng(3)
    D, N = 40, 64
    dens = rng.poisson(0.8, size=(D, N)).astype(np.float32)
    dens[0, ~(dens > 0).any(axis=0)] = 1.0
    for g in (3, 17, 31):                      # hot genes
        dens[g] += rng.poisson(30, size=N)
    rr, cc = np.nonzero(dens)
    vv = dens[rr, cc]
    order = np.lexsort((rr, cc))
    path = str(tmp_path / "hot.mtx.gz")
    write_matrix_market_file(path, rr[order], cc[order], vv[order], (D, N))
    idx = build_mmutil_index(path)

    B = 16
    data = MtxMemoryBlock(path, idx, B)
    cov_path = str(tmp_path / "cov.mtx.gz")
    create_ones_like(data, cov_path)
    cov_idx = build_mmutil_index(cov_path)
    covar = MtxDataBlock(cov_path, cov_idx, B)
    covar.auto_ones = True
    model = NBVAE(data_dim=D, covar_dim=1)
    return data, covar, model, dens


def _train(data, covar, model, perm, recorder=None, epochs=3,
           on_epoch_end=None):
    topt = TrainingOptions(nboot=2, max_epoch=epochs, recording=100,
                           superbatch=3, seed=0, auto_ondevice=False)
    params = model.init(jax.random.PRNGKey(0))
    return train_vae_model(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        recorder, data, covar, topt,
        lambda x, out, beta: nb_loss(x, out, beta),
        params, ondevice=True, feature_perm=perm,
        on_epoch_end=on_epoch_end,
    )


def test_perm_trajectory_and_params_canonical(hot_setup, monkeypatch,
                                              capsys):
    data, covar, model, dens = hot_setup
    p_ref, l_ref = _train(data, covar, model, perm=False)
    monkeypatch.setenv("MMVAE_FEATURE_PERM", "force")  # CPU: no kernel
    p_prm, l_prm = _train(data, covar, model, perm=True)
    assert "Feature clustering: 3 hot genes" in capsys.readouterr().err
    # reassociation-level differences only
    np.testing.assert_allclose(l_ref, l_prm, rtol=2e-4)
    leaves_ref = dict(jax.tree_util.tree_leaves_with_path(p_ref))
    for kpath, leaf in jax.tree_util.tree_leaves_with_path(p_prm):
        ref = np.asarray(leaves_ref[kpath])
        np.testing.assert_allclose(
            np.asarray(leaf), ref, rtol=2e-3, atol=2e-4,
            err_msg=f"params not canonical at "
                    f"{jax.tree_util.keystr(kpath)}",
        )


def test_perm_artifacts_in_input_order(hot_setup, monkeypatch, tmp_path):
    from mmvae_tpu.train.recorder import LatentRecorder

    data, covar, model, dens = hot_setup

    def run(tag, perm):
        topt = TrainingOptions(nboot=2, max_epoch=2, recording=2,
                               superbatch=3, seed=0, auto_ondevice=False)
        params = model.init(jax.random.PRNGKey(0))
        rec = LatentRecorder(
            str(tmp_path / tag), topt.max_epoch, data.ntot(),
            encode_fn=lambda p, x: model.encode_mu(p, x),
        )
        train_vae_model(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            rec, data, covar, topt,
            lambda x, out, beta: nb_loss(x, out, beta),
            params, ondevice=True, feature_perm=perm,
        )

        def load(name):
            return np.loadtxt(gzip.open(tmp_path / f"{tag}_1{name}.gz",
                                        "rt"))
        return (load(".mu_mean"), load("_mu_decoding.weight"),
                load("_x_mean"))

    m_ref, w_ref, xm_ref = run("ref", False)
    monkeypatch.setenv("MMVAE_FEATURE_PERM", "force")
    m_prm, w_prm, xm_prm = run("prm", True)
    # posteriors are gene-order independent; D-axis artifacts must come
    # back in INPUT order (a leaked permutation would scramble columns
    # by whole standard deviations, far beyond these tolerances)
    np.testing.assert_allclose(m_ref, m_prm, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(w_ref, w_prm, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(xm_ref, xm_prm, rtol=2e-3, atol=2e-4)


def test_perm_mixture_cli_consistent(hot_setup, tmp_path):
    """Mixture model under the permutation: the label matrix and the
    fast step's packed caches permute through the CLI hook, so scores
    and artifacts match the unpermuted run to reassociation level."""
    import os
    import subprocess
    import sys

    data, covar, model, dens = hot_setup
    D = dens.shape[0]
    annot = str(tmp_path / "annot.txt")
    rows = str(tmp_path / "rows.txt")
    with open(rows, "w") as f:
        f.write("\n".join(f"g{i}" for i in range(D)) + "\n")
    with open(annot, "w") as f:
        f.write("\n".join(f"g{i}\tk{i % 4}" for i in range(D)) + "\n")

    def run(tag, force):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["MMVAE_FEATURE_PERM"] = "force" if force else "0"
        out = str(tmp_path / tag)
        r = subprocess.run(
            [sys.executable, "-m", "mmvae_tpu.cli.vmfnb_vae",
             "--mtx", data.mtx_file, "--annot", annot, "--row", rows,
             "--out", out, "--max_epoch", "2", "--recording", "2",
             "--batch_size", "16", "--superbatch", "2"],
            env=env, capture_output=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        return out, r.stderr.decode()

    out_ref, _ = run("mref", False)
    out_prm, log = run("mprm", True)
    assert "Feature clustering" in log

    def scores(o):
        return np.array([float(v) for v in gzip.open(o + ".scores.gz",
                                                     "rt")])

    np.testing.assert_allclose(scores(out_ref), scores(out_prm),
                               rtol=2e-4)
    a = np.loadtxt(gzip.open(out_ref + "_1.mu_mean.gz", "rt"))
    b = np.loadtxt(gzip.open(out_prm + "_1.mu_mean.gz", "rt"))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)
    ca = np.loadtxt(gzip.open(out_ref + "_1.clust.gz", "rt"))
    cb = np.loadtxt(gzip.open(out_prm + "_1.clust.gz", "rt"))
    assert (ca == cb).mean() > 0.95  # hard one-hot may flip rare ties


def test_perm_checkpoint_resume_canonical(hot_setup, monkeypatch,
                                          tmp_path):
    """Checkpoints write canonical order; a resumed run re-derives the
    permutation and continues equivalently."""
    from mmvae_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    data, covar, model, dens = hot_setup
    monkeypatch.setenv("MMVAE_FEATURE_PERM", "force")

    p_straight, _ = _train(data, covar, model, perm=True, epochs=3)

    def on_end(epoch, params, opt_state, loss_vec):
        if epoch == 1:
            save_checkpoint(str(tmp_path / "ck"), params, opt_state,
                            epoch, 0, loss_vec)

    _train(data, covar, model, perm=True, epochs=2, on_epoch_end=on_end)
    tmpl_p = model.init(jax.random.PRNGKey(0))
    from mmvae_tpu.train.loop import Trainer

    topt = TrainingOptions(nboot=2, max_epoch=3, recording=100,
                           superbatch=3, seed=0, auto_ondevice=False)
    tr = Trainer(lambda p, x, c, k, t: model.forward(p, x, c, k, t),
                 lambda x, out, beta: nb_loss(x, out, beta), topt)
    tmpl_o = tr.optimizer.init(tmpl_p)
    pr, orr, next_ep, lv = load_checkpoint(str(tmp_path / "ck"), tmpl_p,
                                           tmpl_o)
    assert next_ep == 2
    # checkpointed decoder weight is in INPUT order: close to the
    # straight run's epoch-3 weights only in magnitude-scale, but the
    # real check is resuming: continue 1 epoch and compare final params
    p_res, _ = train_vae_model(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        None, data, covar, topt,
        lambda x, out, beta: nb_loss(x, out, beta),
        pr, ondevice=True, feature_perm=True,
        start_epoch=next_ep, init_opt_state=orr,
    )
    leaves_ref = dict(jax.tree_util.tree_leaves_with_path(p_straight))
    for kpath, leaf in jax.tree_util.tree_leaves_with_path(p_res):
        ref = np.asarray(leaves_ref[kpath])
        np.testing.assert_allclose(
            np.asarray(leaf), ref, rtol=2e-3, atol=2e-4,
            err_msg=f"resume mismatch at {jax.tree_util.keystr(kpath)}",
        )
