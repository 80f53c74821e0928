"""Tests for the single-pass fused step kernels (ops/nb_step.py).

Run in Pallas interpret mode on CPU; semantics are checked against the
plain-XLA spec (``xla_step_nll``) and against the v1 fused path
(``NBVAE.fused_loss``), whose own parity with the LibTorch reference is
covered by tests/test_torch_parity.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops import nb_step
from mmvae_tpu.ops.nb_step import (
    nb_step_boot,
    nb_step_report,
    xla_step_nll,
)


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(nb_step, "_INTERPRET", True)


def _mk_inputs(B=10, D=1100, R=2, C=1, Rn=1, seed=0, max_count=6,
               non_integer=False, lam=0.8, x_dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = rng.poisson(lam, size=(B, D)).clip(0, max_count).astype(np.float32)
    if non_integer:
        x[0, :7] += 0.5
    x = x.astype(x_dtype)
    zm = rng.normal(size=(B, R)).astype(np.float32)
    c = rng.normal(size=(B, C)).astype(np.float32)
    zn = rng.normal(size=(B, Rn)).astype(np.float32)
    depth = np.abs(rng.normal(size=(B, 1))).astype(np.float32) + 0.3
    wd = (rng.normal(size=(R, D)) * 0.2).astype(np.float32)
    wc = (rng.normal(size=(C, D)) * 0.2).astype(np.float32)
    bias2 = (rng.normal(size=(D,)) * 0.2).astype(np.float32)
    wn = (rng.normal(size=(Rn, D)) * 0.2).astype(np.float32)
    bias_n = (rng.normal(size=(D,)) * 0.2).astype(np.float32)
    return tuple(map(jnp.asarray, (x, zm, c, zn, depth, wd, wc, bias2,
                                   wn, bias_n)))


@pytest.mark.parametrize("with_const", [False, True])
@pytest.mark.parametrize(
    "B,D,lam,maxc,nonint",
    [
        (10, 1100, 0.8, 6, False),    # all tiles fast
        (8, 1024, 9.0, 40, False),    # all tiles exact (large counts)
        (13, 640, 0.8, 6, True),      # non-integer -> exact tiles
    ],
)
def test_report_value_matches_xla(B, D, lam, maxc, nonint, with_const):
    args = _mk_inputs(B=B, D=D, lam=lam, max_count=maxc, non_integer=nonint)
    nll = nb_step_report(*args, include_const=with_const)
    want = xla_step_nll(*args, include_const=with_const)
    np.testing.assert_allclose(float(nll), float(want), rtol=3e-5)


@pytest.mark.parametrize("x_dtype", [np.int16, np.int8])
def test_integer_count_dtypes(x_dtype):
    args = _mk_inputs(x_dtype=x_dtype, seed=5)
    nll = nb_step_report(*args)
    want = xla_step_nll(*args, include_const=True)
    np.testing.assert_allclose(float(nll), float(want), rtol=3e-5)


@pytest.mark.parametrize("fastpath", [True, False])
def test_boot_value_and_grads_match_xla(fastpath):
    args = _mk_inputs(max_count=6 if fastpath else 40,
                      lam=0.8 if fastpath else 9.0, seed=3)

    diff_idx = (1, 3, 4, 5, 6, 7, 8, 9)  # zm, zn, depth, wd, wc, b2, wn, bn

    def loss_v2(*diff_args):
        a = list(args)
        for i, v in zip(diff_idx, diff_args):
            a[i] = v
        return nb_step_boot(*a)

    def loss_ref(*diff_args):
        a = list(args)
        for i, v in zip(diff_idx, diff_args):
            a[i] = v
        return xla_step_nll(*a, include_const=False)

    diff_args = tuple(args[i] for i in diff_idx)
    v2, g2 = jax.value_and_grad(loss_v2, argnums=range(len(diff_idx)))(
        *diff_args)
    vr, gr = jax.value_and_grad(loss_ref, argnums=range(len(diff_idx)))(
        *diff_args)
    np.testing.assert_allclose(float(v2), float(vr), rtol=3e-5)
    names = ["zm", "zn", "depth", "wd", "wc", "bias2", "wn", "bias_n"]
    for name, a, b in zip(names, g2, gr):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6 * scale,
            err_msg=f"grad mismatch: {name}",
        )


def test_boot_grads_mixed_tiles():
    """Tiles with large counts use the exact path, others the fast one;
    the mixture must still match the XLA grads."""
    args = list(_mk_inputs(seed=11, D=1100))
    x = np.asarray(args[0]).copy()
    x[2, 600] = 31.0  # tile 1 -> exact
    args[0] = jnp.asarray(x)

    def loss_v2(wd):
        a = list(args)
        a[5] = wd
        return nb_step_boot(*a)

    def loss_ref(wd):
        a = list(args)
        a[5] = wd
        return xla_step_nll(*a, include_const=False)

    g2 = jax.grad(loss_v2)(args[5])
    gr = jax.grad(loss_ref)(args[5])
    np.testing.assert_allclose(np.asarray(g2), np.asarray(gr), rtol=5e-4,
                               atol=1e-6)


def test_model_fused_step_matches_fused_loss():
    """Model-level: v2 report/boot vs the v1 fused path (same key)."""
    D, B = 900, 11
    model = NBVAE(data_dim=D, covar_dim=1, mean_latent=2)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.poisson(0.5, size=(B, D)).astype(np.float32))
    c = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(42)
    beta = jnp.float32(0.37)

    rep2 = model.fused_step_report(params, x, c, key, beta)
    rep1 = model.fused_loss(params, x, c, key, beta, True, True)
    np.testing.assert_allclose(float(rep2), float(rep1), rtol=3e-5)

    g2 = jax.grad(
        lambda p: model.fused_step_boot(p, x, c, key, beta)
    )(params)
    g1 = jax.grad(
        lambda p: model.fused_loss(p, x, c, key, beta, True, False)
    )(params)
    flat2 = jax.tree_util.tree_leaves_with_path(g2)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in flat2:
        ref = flat1[path]
        scale = max(1e-3, float(jnp.abs(ref).max()))
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=1e-3,
            atol=2e-5 * scale,
            err_msg=f"model grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_fallback_paths_used_for_hidden_decoder():
    model = NBVAE(data_dim=600, covar_dim=1, mean_latent=2,
                  mean_decoding=(16,))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.poisson(0.5, size=(9, 600)).astype(np.float32))
    c = jnp.ones((9, 1), jnp.float32)
    key = jax.random.PRNGKey(7)
    loss = model.fused_step_report(params, x, c, key, jnp.float32(1.0))
    want = model.fused_loss(params, x, c, key, jnp.float32(1.0), True, True)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)


@pytest.mark.parametrize(
    "B,D,R,C,Rn,lam,maxc",
    [
        (7, 520, 3, 2, 2, 0.8, 6),     # wider latents/covariates, odd B
        (16, 512, 1, 1, 1, 0.8, 6),    # minimal dims, exact tiling
        (9, 1537, 2, 3, 1, 5.0, 200),  # non-tile-aligned D, exact path
        (24, 640, 4, 1, 2, 2.0, 7),    # boundary counts == 7
    ],
)
def test_boot_grads_across_shapes(B, D, R, C, Rn, lam, maxc):
    """Gradient parity for non-default architectures and odd shapes."""
    args = _mk_inputs(B=B, D=D, R=R, C=C, Rn=Rn, lam=lam, max_count=maxc,
                      seed=B * 7 + D)

    def loss_v2(zm, wd, bias2, wn, depth):
        a = list(args)
        a[1], a[5], a[7], a[8], a[4] = zm, wd, bias2, wn, depth
        return nb_step_boot(*a)

    def loss_ref(zm, wd, bias2, wn, depth):
        a = list(args)
        a[1], a[5], a[7], a[8], a[4] = zm, wd, bias2, wn, depth
        return xla_step_nll(*a, include_const=False)

    sel = (args[1], args[5], args[7], args[8], args[4])
    v2, g2 = jax.value_and_grad(loss_v2, argnums=range(5))(*sel)
    vr, gr = jax.value_and_grad(loss_ref, argnums=range(5))(*sel)
    np.testing.assert_allclose(float(v2), float(vr), rtol=5e-5)
    for name, a, b in zip(("zm", "wd", "bias2", "wn", "depth"), g2, gr):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5 * scale,
            err_msg=f"grad mismatch ({name}) at B={B} D={D} R={R} "
                    f"C={C} Rn={Rn}",
        )


# ----------------------------------------------------------------------
# joint-model kernel variant: pb outside log_softmax + exp-nu
# (reference: vmfnb.hh:462-467, 488-493)
# ----------------------------------------------------------------------

def _mk_pb(D, seed=2):
    rng = np.random.default_rng(seed)
    return jnp.asarray((rng.normal(size=(D,)) * 0.2).astype(np.float32))


@pytest.mark.parametrize("fastpath", [True, False])
def test_joint_report_value_matches_xla(fastpath):
    from mmvae_tpu.ops.nb_step import nb_step_report

    args = _mk_inputs(max_count=6 if fastpath else 40,
                      lam=0.8 if fastpath else 9.0, seed=7)
    pb = _mk_pb(args[0].shape[1])
    nll = nb_step_report(*args, include_const=True, pb=pb, nu_exp=True)
    want = xla_step_nll(*args, pb=pb, include_const=True, nu_exp=True)
    np.testing.assert_allclose(float(nll), float(want), rtol=3e-5)


@pytest.mark.parametrize("fastpath", [True, False])
def test_joint_boot_value_and_grads_match_xla(fastpath):
    from mmvae_tpu.ops.nb_step import nb_step_boot_joint

    args = _mk_inputs(max_count=6 if fastpath else 40,
                      lam=0.8 if fastpath else 9.0, seed=13)
    pb = _mk_pb(args[0].shape[1], seed=5)
    full = tuple(args) + (pb,)
    diff_idx = (1, 3, 4, 5, 6, 7, 8, 9, 10)  # + pb

    def loss_v2(*diff_args):
        a = list(full)
        for i, v in zip(diff_idx, diff_args):
            a[i] = v
        return nb_step_boot_joint(*a)

    def loss_ref(*diff_args):
        a = list(full)
        for i, v in zip(diff_idx, diff_args):
            a[i] = v
        return xla_step_nll(a[0], a[1], a[2], a[3], a[4], a[5], a[6],
                            a[7], a[8], a[9], a[10], include_const=False,
                            nu_exp=True)

    diff_args = tuple(full[i] for i in diff_idx)
    v2, g2 = jax.value_and_grad(loss_v2, argnums=range(len(diff_idx)))(
        *diff_args)
    vr, gr = jax.value_and_grad(loss_ref, argnums=range(len(diff_idx)))(
        *diff_args)
    np.testing.assert_allclose(float(v2), float(vr), rtol=3e-5)
    names = ["zm", "zn", "depth", "wd", "wc", "bias2", "wn", "bias_n", "pb"]
    for name, a, b in zip(names, g2, gr):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6 * scale,
            err_msg=f"joint grad mismatch: {name}",
        )


def test_vmfnb_fused_step_matches_composite():
    """Model-level: joint fused step vs the XLA composite loss."""
    from mmvae_tpu.models.vmfnb import VMFNBVAE, vmfnb_composite_loss

    D, B = 900, 11
    model = VMFNBVAE(data_dim=D, mean_latent=2)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.poisson(0.5, size=(B, D)).astype(np.float32))
    c = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(42)
    beta = jnp.float32(0.37)

    rep = model.fused_step_report(params, x, c, key, beta)
    out = model.forward(params, x, key, True)
    want = vmfnb_composite_loss(x, out, beta)
    np.testing.assert_allclose(float(rep), float(want), rtol=3e-5)

    g2 = jax.grad(lambda p: model.fused_step_boot(p, x, c, key, beta))(
        params)
    g1 = jax.grad(lambda p: vmfnb_composite_loss(
        x, model.forward(p, x, key, True), beta))(params)
    flat2 = jax.tree_util.tree_leaves_with_path(g2)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in flat2:
        ref = flat1[path]
        scale = max(1e-3, float(jnp.abs(ref).max()))
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=1e-3,
            atol=2e-5 * scale,
            err_msg=f"vmfnb grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_mixture_fused_step_matches_composite():
    """Model-level: mixture fused step vs the XLA composite loss."""
    from mmvae_tpu.models.vmfnb_mixture import (
        VMFNBMixtureVAE,
        mixture_composite_loss,
    )

    D, B, K = 900, 11, 3
    rng = np.random.default_rng(4)
    L = (rng.uniform(size=(D, K)) < 0.4).astype(np.float32)
    L[~(L.sum(axis=1) > 0), 0] = 1.0
    model = VMFNBMixtureVAE(label=L, mean_latent=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.poisson(0.5, size=(B, D)).astype(np.float32))
    c = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(9)
    beta = jnp.float32(0.8)

    rep = model.fused_step_report(params, x, c, key, beta)
    out = model.forward(params, x, key, True)
    want = mixture_composite_loss(x, out, beta, model.dd)
    np.testing.assert_allclose(float(rep), float(want), rtol=3e-5)

    g2 = jax.grad(lambda p: model.fused_step_boot(p, x, c, key, beta))(
        params)
    g1 = jax.grad(lambda p: mixture_composite_loss(
        x, model.forward(p, x, key, True), beta, model.dd))(params)
    flat2 = jax.tree_util.tree_leaves_with_path(g2)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, leaf in flat2:
        ref = flat1[path]
        scale = max(1e-3, float(jnp.abs(ref).max()))
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(ref), rtol=1e-3,
            atol=2e-5 * scale,
            err_msg=f"mixture grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_boot_grads_extreme_counts():
    """Mixed product/Stirling path: integer counts up to thousands
    (atlas-depth data) must match XLA values and grads."""
    args = list(_mk_inputs(seed=17, D=1100, lam=1.0, max_count=6))
    x = np.asarray(args[0]).copy()
    rng = np.random.default_rng(3)
    hot = rng.integers(0, x.shape[1], size=40)
    x[:, hot] = rng.poisson(800.0, size=(x.shape[0], 40))
    x[0, hot[0]] = 4000.0
    args[0] = jnp.asarray(x)

    nll = nb_step_report(*args, include_const=True)
    want = xla_step_nll(*args, include_const=True)
    np.testing.assert_allclose(float(nll), float(want), rtol=3e-5)

    def loss_v2(zm, wd, wn):
        a = list(args)
        a[1], a[5], a[8] = zm, wd, wn
        return nb_step_boot(*a)

    def loss_ref(zm, wd, wn):
        a = list(args)
        a[1], a[5], a[8] = zm, wd, wn
        return xla_step_nll(*a, include_const=False)

    sel = (args[1], args[5], args[8])
    v2, g2 = jax.value_and_grad(loss_v2, argnums=range(3))(*sel)
    vr, gr = jax.value_and_grad(loss_ref, argnums=range(3))(*sel)
    np.testing.assert_allclose(float(v2), float(vr), rtol=5e-5)
    for name, a, b in zip(("zm", "wd", "wn"), g2, gr):
        scale = max(1e-3, float(jnp.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5 * scale,
            err_msg=f"extreme-count grad mismatch: {name}",
        )


def test_fused_step_int_x_close():
    """Integer batches through the fused step agree with the widened
    path to float precision.  (The training loop widens int batches
    once per superbatch — measured 16% FASTER than feeding int16 to
    the kernels, which re-convert per pass — so this documents the
    fallback contract, not the hot path.)"""
    D, B = 900, 11
    model = NBVAE(data_dim=D, covar_dim=1, mean_latent=2)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    xi = rng.poisson(0.9, size=(B, D)).astype(np.int16)
    c = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(3)
    beta = jnp.float32(0.5)

    for fn in (model.fused_step_report, model.fused_step_boot):
        vi = fn(params, jnp.asarray(xi), c, key, beta)
        vf = fn(params, jnp.asarray(xi.astype(np.float32)), c, key, beta)
        np.testing.assert_allclose(float(vi), float(vf), rtol=1e-6)

    gi = jax.grad(lambda p: model.fused_step_boot(
        p, jnp.asarray(xi), c, key, beta))(params)
    gf = jax.grad(lambda p: model.fused_step_boot(
        p, jnp.asarray(xi.astype(np.float32)), c, key, beta))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gi),
                    jax.tree_util.tree_leaves(gf)):
        scale = max(1e-3, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6 * scale)


def test_use_kernel_batch_gate(monkeypatch):
    """Batches whose padded rows can't tile under Mosaic's scoped-VMEM
    cap even at the 128-lane floor must route to the XLA step instead
    of emitting an un-compilable kernel."""
    monkeypatch.setattr(nb_step, "_INTERPRET", False)
    monkeypatch.setattr(nb_step.jax, "default_backend", lambda: "tpu")
    assert nb_step._use_kernel(20000, 100)
    assert nb_step._use_kernel(20000, nb_step._SLOT_CAP // 128)
    assert not nb_step._use_kernel(20000, nb_step._SLOT_CAP // 128 + 8)
    # the tile helper itself floors at 128 lanes
    assert nb_step._tile_for(nb_step._SLOT_CAP // 128) == 128
