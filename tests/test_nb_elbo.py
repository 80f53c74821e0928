"""Fused Pallas NB ELBO kernel vs the plain-XLA reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.ops import nb_elbo


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    # Pallas TPU kernels run via the interpreter on CPU
    monkeypatch.setattr(nb_elbo, "_INTERPRET", True)


def _inputs(B=12, D=256, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.poisson(1.0, size=(B, D)).astype(np.float32)
    h = rng.normal(0, 2.0, size=(B, D)).astype(np.float32)
    nu_pre = rng.normal(0, 2.0, size=(B, D)).astype(np.float32)
    depth = rng.uniform(0.5, 30.0, size=(B, 1)).astype(np.float32)
    return (jnp.asarray(x), jnp.asarray(h), jnp.asarray(nu_pre),
            jnp.asarray(depth))


def test_forward_matches_reference():
    x, h, nu_pre, depth = _inputs()
    got = float(nb_elbo.nb_nllik_fused(x, h, nu_pre, depth))
    want = float(nb_elbo._reference_impl(x, h, nu_pre, depth))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_forward_matches_nb_nllik():
    """Fused op == unfused model decode + nb_nllik(include_const=False)."""
    from mmvae_tpu.ops.losses import nb_nllik

    x, h, nu_pre, depth = _inputs(seed=3)
    recon_mu = jnp.exp(jax.nn.log_softmax(h, axis=1))
    recon_nu = jnp.clip(jax.nn.softplus(nu_pre), 1e-4, 1e4)
    want = float(nb_nllik(x, recon_mu, recon_nu, depth, False))
    got = float(nb_elbo.nb_nllik_fused(x, h, nu_pre, depth))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_gradients_match_reference():
    x, h, nu_pre, depth = _inputs(B=8, D=128, seed=1)

    gf = jax.grad(lambda h, n, d: nb_elbo.nb_nllik_fused(x, h, n, d),
                  argnums=(0, 1, 2))
    gr = jax.grad(lambda h, n, d: nb_elbo._reference_impl(x, h, n, d),
                  argnums=(0, 1, 2))
    got = gf(h, nu_pre, depth)
    want = gr(h, nu_pre, depth)
    for g, w, name in zip(got, want, ["dh", "dnu_pre", "ddepth"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=1e-5,
            err_msg=name,
        )


def test_gradient_scaling():
    """Cotangent scaling flows through the custom VJP."""
    x, h, nu_pre, depth = _inputs(B=8, D=128, seed=2)
    g1 = jax.grad(lambda h: nb_elbo.nb_nllik_fused(x, h, nu_pre, depth))(h)
    g3 = jax.grad(lambda h: 3.0 * nb_elbo.nb_nllik_fused(x, h, nu_pre, depth))(h)
    np.testing.assert_allclose(np.asarray(g3), 3 * np.asarray(g1), rtol=1e-4)


def test_masked_last_tile():
    """D not a multiple of the tile width exercises the iota-mask path."""
    x, h, nu_pre, depth = _inputs(B=6, D=300, seed=5)
    got = float(nb_elbo.nb_nllik_fused(x, h, nu_pre, depth))
    want = float(nb_elbo._reference_impl(x, h, nu_pre, depth))
    np.testing.assert_allclose(got, want, rtol=2e-5)
    gf = jax.grad(lambda h, n, d: nb_elbo.nb_nllik_fused(x, h, n, d),
                  argnums=(0, 1, 2))(h, nu_pre, depth)
    gr = jax.grad(lambda h, n, d: nb_elbo._reference_impl(x, h, n, d),
                  argnums=(0, 1, 2))(h, nu_pre, depth)
    for g, w in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=1e-5)


def test_fallback_for_odd_D():
    """D not divisible by 128 -> XLA fallback path, same value + grads."""
    x, h, nu_pre, depth = _inputs(B=4, D=100)
    got = float(nb_elbo.nb_nllik_fused(x, h, nu_pre, depth))
    want = float(nb_elbo._reference_impl(x, h, nu_pre, depth))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    g = jax.grad(lambda h: nb_elbo.nb_nllik_fused(x, h, nu_pre, depth))(h)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fused_model_loss_matches_unfused():
    """NBVAE.fused_loss == nb_loss(forward(...)) on the same key."""
    from mmvae_tpu.models.nb import NBVAE
    from mmvae_tpu.ops.losses import nb_loss

    D, C, B = 256, 1, 8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.poisson(2.0, size=(B, D)).astype(np.float32))
    c = jnp.ones((B, C), jnp.float32)
    model = NBVAE(data_dim=D, covar_dim=C)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)

    want = float(nb_loss(x, model.forward(params, x, c, key, True), 0.7))
    got = float(model.fused_loss(params, x, c, key, 0.7, True))
    np.testing.assert_allclose(got, want, rtol=2e-5)
