"""v3 packed fast step for the joint model (ops/vmfnb_fast.py) vs the
generic fused-kernel path.

Same contract as tests/test_nb_fast.py: identical PRNG draws, same
kernels, trajectories equal up to float reassociation from the hoisted
views and the Gram-collapsed vMF normalizer.
"""

import numpy as np
import pytest

import jax

from mmvae_tpu.models.vmfnb import VMFNBVAE, vmfnb_composite_loss
from mmvae_tpu.ops import nb_step
from mmvae_tpu.ops.vmfnb_fast import VMFNBFastStep
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import Trainer


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(nb_step, "_INTERPRET", True)


def _mk_data(S=2, B=8, D=640, seed=3, dtype=np.int16):
    rng = np.random.default_rng(seed)
    x = rng.poisson(0.7, size=(S, B, D)).astype(dtype)
    c = np.ones((S, B, 1), np.float32)
    return x, c


def _make_trainer(model, topt, fast):
    kw = {}
    if fast:
        kw["fast_step"] = VMFNBFastStep(model, topt)
    return Trainer(
        lambda p, x, c, k, t: model.forward(p, x, k, t),
        lambda x, o, b: vmfnb_composite_loss(x, o, b),
        topt,
        report_loss_override=lambda p, x, c, k, b: model.fused_step_report(
            p, x, c, k, b, include_data_const=True),
        boot_loss_override=lambda p, x, c, k, b: model.fused_step_boot(
            p, x, c, k, b, need_value=False),
        **kw,
    )


def test_joint_pack_unpack_roundtrip():
    model = VMFNBVAE(data_dim=640, mean_latent=2)
    params = model.init(jax.random.PRNGKey(1))
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    fast = VMFNBFastStep(model, topt)
    back = fast.unpack(fast.pack(params))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


@pytest.mark.parametrize("dtype", [np.int16, np.float32])
def test_joint_fast_matches_generic_trajectory(dtype):
    model = VMFNBVAE(data_dim=640, mean_latent=2)
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    x, c = _mk_data(dtype=dtype)

    results = []
    for fast in (False, True):
        tr = _make_trainer(model, topt, fast)
        params = model.init(jax.random.PRNGKey(0))
        s = tr.optimizer.init(params)
        reps = []
        for epoch in range(2):
            params, s, rep = tr.step(params, s, x, c, epoch,
                                     np.arange(x.shape[0]))
            reps.append(np.asarray(rep))
        results.append((params, np.concatenate(reps)))

    (p2, r2), (p3, r3) = results
    np.testing.assert_allclose(r3, r2, rtol=2e-4)
    for path, leaf in jax.tree_util.tree_leaves_with_path(p2):
        other = dict(jax.tree_util.tree_leaves_with_path(p3))[path]
        # slightly wider atol than the NB test: the Gram-collapsed vMF
        # normalizer adds one more reassociation source, worth ~3e-5
        # absolute on isolated tiny-magnitude weights after 6 updates
        np.testing.assert_allclose(np.asarray(other), np.asarray(leaf),
                                   rtol=3e-3, atol=1e-4,
                                   err_msg=str(path))


def test_joint_fast_int_float_invariance():
    model = VMFNBVAE(data_dim=640, mean_latent=2)
    topt = TrainingOptions(nboot=2, superbatch=2, seed=0)
    xi, c = _mk_data(dtype=np.int16)
    xf = xi.astype(np.float32)
    outs = []
    for x in (xi, xf):
        tr = _make_trainer(model, topt, fast=True)
        params = model.init(jax.random.PRNGKey(0))
        s = tr.optimizer.init(params)
        params, s, rep = tr.step(params, s, x, c, 0, np.arange(2))
        outs.append(np.asarray(rep))
    np.testing.assert_array_equal(outs[0], outs[1])


# ----------------------------------------------------------------------
# mixture model
# ----------------------------------------------------------------------

def _mk_label(D=640, K=5, seed=11):
    rng = np.random.default_rng(seed)
    L = (rng.random((D, K)) < 0.25).astype(np.float32)
    L[:K] = np.eye(K, dtype=np.float32)  # every component non-empty
    return L


def _make_mixture_trainer(model, topt, fast):
    from mmvae_tpu.models.vmfnb_mixture import mixture_composite_loss
    from mmvae_tpu.ops.vmfnb_fast import VMFNBMixtureFastStep

    kw = {}
    if fast:
        kw["fast_step"] = VMFNBMixtureFastStep(model, topt)
    dd = model.dd
    return Trainer(
        lambda p, x, c, k, t: model.forward(p, x, k, t),
        lambda x, o, b: mixture_composite_loss(x, o, b, dd),
        topt,
        report_loss_override=lambda p, x, c, k, b: model.fused_step_report(
            p, x, c, k, b, include_data_const=True),
        boot_loss_override=lambda p, x, c, k, b: model.fused_step_boot(
            p, x, c, k, b, need_value=False),
        **kw,
    )


def test_mixture_pack_unpack_roundtrip():
    from mmvae_tpu.models.vmfnb_mixture import VMFNBMixtureVAE
    from mmvae_tpu.ops.vmfnb_fast import VMFNBMixtureFastStep

    model = VMFNBMixtureVAE(label=_mk_label(), mean_latent=2)
    params = model.init(jax.random.PRNGKey(1))
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    fast = VMFNBMixtureFastStep(model, topt)
    back = fast.unpack(fast.pack(params))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


@pytest.mark.parametrize("dtype", [np.int16, np.float32])
def test_mixture_fast_matches_generic_trajectory(dtype):
    from mmvae_tpu.models.vmfnb_mixture import VMFNBMixtureVAE

    model = VMFNBMixtureVAE(label=_mk_label(), mean_latent=2)
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    x, c = _mk_data(dtype=dtype)

    results = []
    for fast in (False, True):
        tr = _make_mixture_trainer(model, topt, fast)
        params = model.init(jax.random.PRNGKey(0))
        s = tr.optimizer.init(params)
        reps = []
        for epoch in range(2):
            params, s, rep = tr.step(params, s, x, c, epoch,
                                     np.arange(x.shape[0]))
            reps.append(np.asarray(rep))
        results.append((params, np.concatenate(reps)))

    (p2, r2), (p3, r3) = results
    np.testing.assert_allclose(r3, r2, rtol=2e-4)
    for path, leaf in jax.tree_util.tree_leaves_with_path(p2):
        other = dict(jax.tree_util.tree_leaves_with_path(p3))[path]
        np.testing.assert_allclose(np.asarray(other), np.asarray(leaf),
                                   rtol=3e-3, atol=1e-4,
                                   err_msg=str(path))


# ----------------------------------------------------------------------
# fused count-encoder wiring: kernel path (interpret mode) vs the
# bitwise XLA fallback the CPU trajectory tests above exercise
# ----------------------------------------------------------------------

def _loss_and_bootgrad(fast, q, x, rand, n_eps):
    import jax.numpy as jnp

    assert len(rand["boot_eps"]) == n_eps
    xj = jnp.asarray(x)
    views = fast._views(xj)
    report = fast._loss(q, views, xj, None, None, rand["rep_eps"],
                        0.5, True, False)
    grads = jax.grad(
        lambda qq: fast._loss(
            qq, views, xj, None, rand["ridx"][0],
            tuple(e[0] for e in rand["boot_eps"]), 0.5, False, True,
        )
    )(q)
    return np.asarray(report), jax.tree_util.tree_map(np.asarray, grads)


def _assert_kernel_matches_fallback(fast, monkeypatch, n_eps, D=640,
                                    grad_atol=1e-6):
    import mmvae_tpu.ops.enc_kernel as ek

    params = fast.model.init(jax.random.PRNGKey(0))
    q = fast.pack(params)
    x, _ = _mk_data(S=1, B=8, D=D)
    rand = fast._draw_batch(jax.random.PRNGKey(7), 8)

    base = _loss_and_bootgrad(fast, q, x[0], rand, n_eps)
    monkeypatch.setattr(ek, "_INTERPRET", True)
    kern = _loss_and_bootgrad(fast, q, x[0], rand, n_eps)

    # tile-accumulated dots/stats reassociate vs the whole-array fallback
    np.testing.assert_allclose(kern[0], base[0], rtol=1e-5)
    for path, leaf in jax.tree_util.tree_leaves_with_path(base[1]):
        other = dict(jax.tree_util.tree_leaves_with_path(kern[1]))[path]
        np.testing.assert_allclose(other, leaf, rtol=1e-4, atol=grad_atol,
                                   err_msg=str(path))


def test_joint_fast_kernel_matches_fallback(monkeypatch):
    model = VMFNBVAE(data_dim=640, mean_latent=2)
    topt = TrainingOptions(nboot=2, superbatch=1, seed=0)
    _assert_kernel_matches_fallback(
        VMFNBFastStep(model, topt), monkeypatch, n_eps=3)


def test_joint_fast_kernel_matches_fallback_multitile(monkeypatch):
    """D=1300 > the 1024 lane tile: exercises the kernels' multi-tile
    accumulator init/writeback path (pl.when j==0 / j==nj-1) under
    interpret mode, which the D=640 single-tile case never reaches.
    Multi-tile accumulation reassociates the f32 sums, so near-zero
    gradient elements need a looser absolute floor (measured max abs
    deviation ~5e-5 on O(0.1) grads)."""
    model = VMFNBVAE(data_dim=1300, mean_latent=2)
    topt = TrainingOptions(nboot=2, superbatch=1, seed=0)
    _assert_kernel_matches_fallback(
        VMFNBFastStep(model, topt), monkeypatch, n_eps=3, D=1300,
        grad_atol=2e-4)


def test_mixture_fast_kernel_matches_fallback(monkeypatch):
    from mmvae_tpu.models.vmfnb_mixture import VMFNBMixtureVAE
    from mmvae_tpu.ops.vmfnb_fast import VMFNBMixtureFastStep

    model = VMFNBMixtureVAE(label=_mk_label(), mean_latent=2)
    topt = TrainingOptions(nboot=2, superbatch=1, seed=0)
    _assert_kernel_matches_fallback(
        VMFNBMixtureFastStep(model, topt), monkeypatch, n_eps=2)
