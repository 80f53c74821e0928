"""Numerical tests for ops: lbessel, losses, initializers."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special

from mmvae_tpu.ops import (
    gaussian_kl,
    kl_weight_schedule,
    l2_normalize,
    lbessel,
    nb_loss,
    nb_nllik,
    torch_linear_init,
    uniform_kl,
)


class TestLbessel:
    def test_forward_two_regimes(self):
        """Forward must match the Oh-Adamczewski-Park formulas the
        reference uses (operators.hh:58-80), not exact log I_nu."""
        from mmvae_tpu.ops.fastmath import fasterlgamma

        df = 999.0  # 0.5 * 2000 - 1
        eta = (df + 0.5) / (2.0 * (df + 1.0))
        for kappa in [0.5, 10.0, 500.0, 998.0]:  # kappa <= df regime
            got = float(lbessel(jnp.float32(kappa), df))
            want = (
                df * math.log(kappa)
                + eta * kappa
                - (eta + df) * math.log(2.0)
                # the reference uses Mineiro's fasterlgamma here
                # (operators.hh:75); we replicate it bit-exactly
                - fasterlgamma(df + 1.0)
            )
            np.testing.assert_allclose(got, want, rtol=1e-4)
        for kappa in [1000.0, 5000.0]:  # kappa > df regime
            got = float(lbessel(jnp.float32(kappa), df))
            want = kappa - 0.5 * math.log(kappa) - 0.5 * math.log(2 * math.pi)
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_forward_approximates_true_logiv(self):
        """Sanity: the approximation tracks scipy's log I_nu."""
        df = 9.0
        for kappa in [2.0, 5.0, 20.0, 100.0]:
            got = float(lbessel(jnp.float32(kappa), df))
            want = float(np.log(special.ive(df, kappa)) + kappa)
            # the OAP two-regime form is a coarse approximation; it stays
            # within ~2.1 nats of the truth over this range (and the
            # reference uses exactly this form, so parity > accuracy)
            assert abs(got - want) < 2.5

    def test_gradient_is_baricz_midpoint(self):
        """Gradient must be the Baricz bound midpoint (operators.hh:28-39),
        NOT the analytic derivative."""
        df = 9.0
        for kappa in [0.5, 3.0, 50.0]:
            g = float(jax.grad(lambda k: lbessel(k, df))(jnp.float32(kappa)))
            lb = math.sqrt(kappa**2 * df / (df + 1.0) + df**2)
            ub = math.sqrt(kappa**2 + df**2)
            want = 0.5 * (lb + ub) / kappa
            np.testing.assert_allclose(g, want, rtol=1e-5)

    def test_vectorized(self):
        k = jnp.array([0.5, 2.0, 100.0])
        out = lbessel(k, 9.0)
        assert out.shape == (3,)
        grads = jax.grad(lambda x: lbessel(x, 9.0).sum())(k)
        assert jnp.all(jnp.isfinite(grads))


class TestLosses:
    def test_gaussian_kl_closed_form(self):
        rng = np.random.default_rng(0)
        mean = rng.normal(size=(5, 3)).astype(np.float32)
        lnvar = rng.normal(size=(5, 3)).astype(np.float32)
        got = float(gaussian_kl(jnp.asarray(mean), jnp.asarray(lnvar)))
        want = -0.5 * np.sum(1 + lnvar - mean**2 - np.exp(lnvar))
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # zero at the prior
        z = jnp.zeros((4, 2))
        assert abs(float(gaussian_kl(z, z))) < 1e-6

    def test_nb_nllik_matches_reference_formula(self):
        """Replicate nllik_loss (nb.hh:511-531) in scipy and compare."""
        rng = np.random.default_rng(1)
        x = rng.poisson(3.0, size=(6, 9)).astype(np.float32)
        mu = rng.uniform(0.01, 1.0, size=(6, 9)).astype(np.float32)
        nu = rng.uniform(0.1, 5.0, size=(6, 9)).astype(np.float32)
        depth = rng.uniform(1.0, 20.0, size=(6, 1)).astype(np.float32)

        eps = 1e-4
        nu_ = nu + eps
        mu_ = mu * depth + eps
        lg = special.gammaln(nu_) + special.gammaln(x + 1) - special.gammaln(nu_ + x)
        denom = np.log(mu_ + nu_)
        pr = x * (denom - np.log(mu_)) + nu_ * (denom - np.log(nu_))
        want = np.sum(lg + pr)

        got = float(nb_nllik(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(nu),
                             jnp.asarray(depth)))
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_nb_nllik_minimized_near_truth(self):
        """NLL at the generating mean should beat a perturbed mean."""
        rng = np.random.default_rng(2)
        true_mu = rng.uniform(0.5, 5.0, size=(1, 20)).astype(np.float32)
        x = rng.poisson(np.repeat(true_mu, 500, 0)).astype(np.float32)
        ones = np.ones((500, 1), np.float32)
        nu = np.full((500, 20), 1e4, np.float32)  # ~Poisson limit
        at_truth = float(nb_nllik(jnp.asarray(x), jnp.asarray(np.repeat(true_mu, 500, 0)),
                                  jnp.asarray(nu), jnp.asarray(ones)))
        off = float(nb_nllik(jnp.asarray(x), jnp.asarray(np.repeat(true_mu * 2.5, 500, 0)),
                             jnp.asarray(nu), jnp.asarray(ones)))
        assert at_truth < off

    def test_uniform_kl(self):
        from mmvae_tpu.ops.fastmath import fasterlog

        # uniform q -> KL is (fasterlog(K) - log K) per row: the
        # reference's fasterlog constant biases it slightly off 0
        # (vmfnb_mixture.hh:705)
        k = 4
        ln_q = jnp.log(jnp.full((3, k), 1.0 / k))
        want = 3 * (fasterlog(k) - math.log(k))
        np.testing.assert_allclose(float(uniform_kl(ln_q)), want, atol=1e-5)
        # peaked q -> ~fasterlog(K) per row
        peaked = jnp.log(jnp.array([[1 - 3e-7, 1e-7, 1e-7, 1e-7]]))
        np.testing.assert_allclose(float(uniform_kl(peaked)), fasterlog(k),
                                   rtol=1e-3)

    def test_kl_schedule(self):
        # beta(0) = kl_max; decays to kl_min floor (mmvae.hh:36-39 defaults)
        assert float(kl_weight_schedule(0, 1.0, 1e-2, 0.1)) == pytest.approx(1.0)
        assert float(kl_weight_schedule(1000, 1.0, 1e-2, 0.1)) == pytest.approx(1e-2)
        mid = float(kl_weight_schedule(10, 1.0, 1e-2, 0.1))
        assert mid == pytest.approx(math.exp(-1.0), rel=1e-5)

    def test_l2_normalize(self):
        x = jnp.array([[3.0, 4.0], [0.0, 0.0]])
        out = l2_normalize(x, axis=1)
        np.testing.assert_allclose(out[0], [0.6, 0.8], rtol=1e-6)
        assert jnp.all(jnp.isfinite(out))  # zero rows don't NaN


class TestInit:
    def test_torch_linear_init_bounds(self):
        key = jax.random.PRNGKey(0)
        p = torch_linear_init(key, 100, 50)
        bound = 1.0 / math.sqrt(100)
        assert p["weight"].shape == (100, 50)
        assert p["bias"].shape == (50,)
        assert float(jnp.abs(p["weight"]).max()) <= bound
        assert float(jnp.abs(p["bias"]).max()) <= bound
        # roughly uniform: std ~ bound/sqrt(3)
        std = float(p["weight"].std())
        assert abs(std - bound / math.sqrt(3)) < 0.15 * bound
