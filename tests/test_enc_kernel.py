"""Fused count-encoder kernel (ops/enc_kernel.py) vs its XLA spec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mmvae_tpu.ops.enc_kernel as ek


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(ek, "_INTERPRET", True)


def _data(B, D, dtype=jnp.int16, seed=0):
    k = jax.random.PRNGKey(seed)
    kx, kl, kxw = jax.random.split(k, 3)
    x = jax.random.poisson(kx, 1.5, (B, D)).astype(dtype)
    WL = jax.random.normal(kl, (3, D)) * 0.1
    WX = jax.random.normal(kxw, (2, D)) * 0.01
    return x, WL, WX


@pytest.mark.parametrize("B,D", [(10, 256), (8, 130), (13, 700)])
@pytest.mark.parametrize("dtype", [jnp.int16, jnp.float32])
def test_forward_matches_spec(B, D, dtype):
    x, WL, WX = _data(B, D, dtype)
    hL, hX, st = ek.count_encode(x, WL, WX, None, True)
    eL, eX, es = ek._xla_encode(x, WL, WX, None, True)
    np.testing.assert_allclose(hL, eL, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(hX, eX, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(st, es, rtol=2e-5, atol=1e-4)


def test_filtered_stats():
    B, D = 9, 384
    x, WL, WX = _data(B, D)
    filt = (jnp.arange(D) % 3 == 0).astype(jnp.float32)[None, :]
    _, _, st = ek.count_encode(x, WL, WX, filt, True)
    _, _, es = ek._xla_encode(x, WL, WX, filt, True)
    np.testing.assert_allclose(st, es, rtol=2e-5, atol=1e-4)
    # unfiltered columns excluded
    L = jnp.log1p(x.astype(jnp.float32)) * filt
    np.testing.assert_allclose(st[:, 2], L.sum(1), rtol=2e-5, atol=1e-4)


def test_weight_grads_match_spec():
    B, D = 11, 640
    x, WL, WX = _data(B, D)

    def scalar(op):
        def f(wl, wx):
            hL, hX, _ = op(x, wl, wx, None, False)
            return jnp.sum(jnp.sin(hL)) + jnp.sum(hX * hX)

        return f

    gk = jax.grad(scalar(ek.count_encode), argnums=(0, 1))(WL, WX)
    ge = jax.grad(scalar(ek._xla_encode), argnums=(0, 1))(WL, WX)
    for a, b in zip(gk, ge):
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=1e-5)


def test_stats_carry_no_grad():
    B, D = 8, 256
    x, WL, WX = _data(B, D)

    def f(wl):
        _, _, st = ek.count_encode(x, wl, WX, None, True)
        hL, _, _ = ek.count_encode(x, wl, WX, None, True)
        return jnp.sum(hL) + 0.0 * jnp.sum(st)

    g = jax.grad(f)(WL)
    assert np.all(np.isfinite(np.asarray(g)))
