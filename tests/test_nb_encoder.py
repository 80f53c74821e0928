"""Fused encoder kernel vs the XLA reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.ops import nb_encoder


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(nb_encoder, "_INTERPRET", True)
    monkeypatch.setattr(nb_encoder, "_tile_d",
                        lambda D: 0 if D < 128 else 128)


def _inputs(B=12, D=300, R=3, M=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.poisson(1.0, size=(B, D)).astype(np.float32))
    xm = jnp.asarray(rng.normal(0, 0.5, size=(1, D)).astype(np.float32))
    ls = jnp.asarray(rng.normal(1, 0.3, size=(1, D)).astype(np.float32))
    wmu = jnp.asarray(rng.normal(0, 0.1, size=(D, R)).astype(np.float32))
    wx = jnp.asarray(rng.normal(0, 0.1, size=(D, M)).astype(np.float32))
    return x, xm, ls, wmu, wx


def test_forward_matches_reference():
    args = _inputs()
    got_mu, got_x = nb_encoder.nb_encoder_fused(*args)
    want_mu, want_x = nb_encoder._reference_impl(*args)
    np.testing.assert_allclose(np.asarray(got_mu), np.asarray(want_mu),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(want_x),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_reference():
    x, xm, ls, wmu, wx = _inputs(B=8, D=260, seed=1)

    def loss_fused(xm, ls, wmu, wx):
        hmu, hx = nb_encoder.nb_encoder_fused(x, xm, ls, wmu, wx)
        return jnp.sum(hmu * hmu) + jnp.sum(jnp.tanh(hx))

    def loss_ref(xm, ls, wmu, wx):
        hmu, hx = nb_encoder._reference_impl(x, xm, ls, wmu, wx)
        return jnp.sum(hmu * hmu) + jnp.sum(jnp.tanh(hx))

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(xm, ls, wmu, wx)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(xm, ls, wmu, wx)
    for g, w, nm in zip(got, want, ["dxm", "dls", "dwmu", "dwx"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=1e-5, err_msg=nm)


def test_model_fused_loss_still_matches_forward():
    """NBVAE.fused_loss (now using both kernels) == unfused nb_loss."""
    from mmvae_tpu.models.nb import NBVAE
    from mmvae_tpu.ops.losses import nb_loss
    from mmvae_tpu.ops import nb_elbo

    D, C, B = 256, 1, 8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.poisson(2.0, size=(B, D)).astype(np.float32))
    c = jnp.ones((B, C), jnp.float32)
    for hidden in [(), (32,)]:
        model = NBVAE(data_dim=D, covar_dim=C, mean_encoding=hidden,
                      do_relu=bool(hidden))
        params = model.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(7)
        want = float(nb_loss(x, model.forward(params, x, c, key, True), 0.7))
        got = float(model.fused_loss(params, x, c, key, 0.7, True))
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_model_fused_gradients_match_unfused():
    from mmvae_tpu.models.nb import NBVAE
    from mmvae_tpu.ops.losses import nb_loss

    D, C, B = 256, 1, 8
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.poisson(2.0, size=(B, D)).astype(np.float32))
    c = jnp.ones((B, C), jnp.float32)
    model = NBVAE(data_dim=D, covar_dim=C)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    g1 = jax.grad(lambda p: nb_loss(
        x, model.forward(p, x, c, key, True), 0.7, False))(params)
    g2 = jax.grad(lambda p: model.fused_loss(
        p, x, c, key, 0.7, True, include_data_const=False))(params)
    f1 = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(g1)}
    f2 = {jax.tree_util.keystr(k): v for k, v in
          jax.tree_util.tree_leaves_with_path(g2)}
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_allclose(
            np.asarray(f1[k]), np.asarray(f2[k]), rtol=2e-3, atol=2e-5,
            err_msg=k,
        )
