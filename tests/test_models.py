"""Model-layer tests: shapes, reference quirks, loss integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.models import NBVAE, VMFVAE, VMFNBVAE, VMFNBMixtureVAE
from mmvae_tpu.models.vmfnb import vmfnb_composite_loss
from mmvae_tpu.models.vmfnb_mixture import mixture_composite_loss
from mmvae_tpu.ops import nb_loss, vmf_loss

D, C, B = 30, 1, 8


@pytest.fixture()
def batch(rng):
    x = rng.poisson(2.0, size=(B, D)).astype(np.float32)
    c = np.ones((B, C), np.float32)
    return jnp.asarray(x), jnp.asarray(c)


class TestNBVAE:
    def test_shapes_default(self, batch):
        x, c = batch
        m = NBVAE(data_dim=D, covar_dim=C)
        params = m.init(jax.random.PRNGKey(0))
        out = m.forward(params, x, c, jax.random.PRNGKey(1))
        assert out.recon_mu.shape == (B, D)
        assert out.recon_nu.shape == (B, D)
        assert out.recon_depth.shape == (B, 1)
        assert out.mu_mean.shape == (B, 2)  # default mean_latent=2
        assert out.nu_mean.shape == (B, 1)

    def test_param_names_match_reference(self):
        m = NBVAE(data_dim=D, covar_dim=C, mean_encoding=(16, 8),
                  mean_decoding=(8,))
        params = m.init(jax.random.PRNGKey(0))
        expect = {
            "x_mean", "ln_x_sd", "mu_bias", "nu_bias",
            "mu_encoding_1", "mu_encoding_2",
            "covar_encoding", "mu_representation_mean",
            "mu_representation_logvariance",
            "mu_decoding_1", "mu_decoding", "covar_decoding",
            "nu_encoding", "nu_representation_mean",
            "nu_representation_logvariance", "nu_decoding", "depth",
        }
        assert set(params) == expect

    def test_no_hidden_encoder_quirk(self):
        """Empty layer list -> Linear(D, latent) + repr Linear(latent, latent)
        (nb.hh:342-349)."""
        m = NBVAE(data_dim=D, covar_dim=C, mean_latent=3)
        params = m.init(jax.random.PRNGKey(0))
        assert params["mu_encoding"]["weight"].shape == (D, 3)
        assert params["mu_representation_mean"]["weight"].shape == (3, 3)

    def test_recon_mu_is_composition(self, batch):
        """decode_mu rows sum to 1 (exp(log_softmax), nb.hh:440-441)."""
        x, c = batch
        m = NBVAE(data_dim=D, covar_dim=C)
        params = m.init(jax.random.PRNGKey(0))
        out = m.forward(params, x, c, jax.random.PRNGKey(1))
        np.testing.assert_allclose(out.recon_mu.sum(axis=1), 1.0, atol=1e-4)

    def test_lnvar_clamped(self, batch):
        x, c = batch
        m = NBVAE(data_dim=D, covar_dim=C)
        params = m.init(jax.random.PRNGKey(0))
        # blow up the encoder weights to force saturation
        params["mu_representation_logvariance"]["weight"] = (
            params["mu_representation_logvariance"]["weight"] * 1e6
        )
        out = m.forward(params, x, c, jax.random.PRNGKey(1))
        assert float(out.mu_lnvar.max()) <= 4.0
        assert float(out.mu_lnvar.min()) >= -4.0

    def test_eval_mode_reparam_is_mean(self, batch):
        """Eval forward is deterministic: reparameterize returns the mean
        (nb.hh:469-471)."""
        x, c = batch
        m = NBVAE(data_dim=D, covar_dim=C)
        params = m.init(jax.random.PRNGKey(0))
        o1 = m.forward(params, x, c, jax.random.PRNGKey(1), training=False)
        o2 = m.forward(params, x, c, jax.random.PRNGKey(2), training=False)
        np.testing.assert_array_equal(o1.recon_mu, o2.recon_mu)
        # training mode with different keys differs
        t1 = m.forward(params, x, c, jax.random.PRNGKey(1), training=True)
        t2 = m.forward(params, x, c, jax.random.PRNGKey(2), training=True)
        assert not np.array_equal(t1.recon_mu, t2.recon_mu)

    def test_loss_finite_and_differentiable(self, batch):
        x, c = batch
        m = NBVAE(data_dim=D, covar_dim=C, mean_encoding=(16,), do_relu=True)
        params = m.init(jax.random.PRNGKey(0))

        def loss_fn(p):
            out = m.forward(p, x, c, jax.random.PRNGKey(1))
            return nb_loss(x, out, 1.0)

        val, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(val))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(g)) for g in flat)
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)


class TestVMFVAE:
    def test_shapes_and_unit_sphere(self, batch):
        x, c = batch
        m = VMFVAE(data_dim=D, covar_dim=C, latent=2)
        params = m.init(jax.random.PRNGKey(0))
        out = m.forward(params, x, c, jax.random.PRNGKey(1))
        assert out.recon.shape == (B, D)
        # decoder output is L2-normalized (vmf.hh:283-290)
        np.testing.assert_allclose(
            np.linalg.norm(out.recon, axis=1), 1.0, rtol=1e-5
        )

    def test_kappa_clamped_and_init(self):
        m = VMFVAE(data_dim=D, covar_dim=C, kappa_min=0.1, kappa_max=10.0)
        params = m.init(jax.random.PRNGKey(0))
        # ln_kappa initialized to log(kappa_min) (vmf.hh:323)
        np.testing.assert_allclose(float(params["ln_kappa"][0]), np.log(0.1),
                                   rtol=1e-6)
        x = jnp.ones((2, D))
        c = jnp.ones((2, C))
        out = m.forward(params, x, c, jax.random.PRNGKey(1))
        assert 0.1 <= float(out.kappa[0]) <= 10.0

    def test_angular_encoder_no_bias(self):
        m = VMFVAE(data_dim=D, covar_dim=C, encoding=(8,))
        params = m.init(jax.random.PRNGKey(0))
        assert "bias" not in params["encoding_1"]
        assert "covar_decoding_" in params  # reference's trailing underscore

    def test_loss_finite_and_differentiable(self, batch):
        x, c = batch
        m = VMFVAE(data_dim=D, covar_dim=C)
        params = m.init(jax.random.PRNGKey(0))
        # move kappa off the clip boundary (at init exp(ln_kappa) ==
        # kappa_min exactly, where the clamp zeroes the loss gradient —
        # faithful to the reference, which escapes via weight decay)
        params["ln_kappa"] = jnp.zeros_like(params["ln_kappa"])

        def loss_fn(p):
            out = m.forward(p, x, c, jax.random.PRNGKey(1))
            return vmf_loss(x, out, 1.0)

        val, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(val))
        assert all(
            np.all(np.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
        )
        # the learned kappa must receive gradient through lbessel
        assert float(jnp.abs(grads["ln_kappa"]).max()) > 0


class TestVMFNB:
    def test_forward_and_loss(self, batch):
        x, _ = batch
        m = VMFNBVAE(data_dim=D, mean_latent=2)
        params = m.init(jax.random.PRNGKey(0))
        out = m.forward(params, x, jax.random.PRNGKey(1))
        assert out.nb_recon_mu.shape == (B, D)
        assert out.vmf_recon.shape == (B, D)
        assert out.vmf_kappa.shape == (B, 1)  # per-sample kappa head
        np.testing.assert_allclose(
            np.linalg.norm(out.vmf_recon, axis=1), 1.0, rtol=1e-5
        )

        def loss_fn(p):
            o = m.forward(p, x, jax.random.PRNGKey(1))
            return vmfnb_composite_loss(x, o, 1.0)

        val, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(val))
        assert all(
            np.all(np.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
        )

    def test_mu_bias_outside_log_softmax(self, batch):
        """vmfnb: recon rows do NOT sum to 1 when mu_bias != 0
        (bias outside log_softmax, vmfnb.hh:466)."""
        x, _ = batch
        m = VMFNBVAE(data_dim=D)
        params = m.init(jax.random.PRNGKey(0))
        params["mu_bias"] = params["mu_bias"] + 1.0
        out = m.forward(params, x, jax.random.PRNGKey(1), training=False)
        sums = np.asarray(out.nb_recon_mu.sum(axis=1))
        assert np.all(np.abs(sums - 1.0) > 0.5)  # ~e, not 1


class TestMixture:
    def _label(self, rng):
        K = 3
        L = np.zeros((D, K), np.float32)
        L[np.arange(D), rng.integers(0, K, D)] = 1.0
        return L

    def test_forward_shapes(self, batch, rng):
        x, _ = batch
        m = VMFNBMixtureVAE(label=self._label(rng))
        params = m.init(jax.random.PRNGKey(0))
        out = m.forward(params, x, jax.random.PRNGKey(1))
        assert out.vmf_logits.shape == (B, 3)
        assert out.vmf_latent.shape == (B, 3)
        # training: soft responsibilities sum to 1
        np.testing.assert_allclose(out.vmf_latent.sum(axis=1), 1.0, atol=1e-4)
        # eval: hard one-hot assignments
        out_eval = m.forward(params, x, jax.random.PRNGKey(1), training=False)
        lat = np.asarray(out_eval.vmf_latent)
        assert np.allclose(lat.sum(axis=1), 1.0)
        assert np.allclose(np.sort(lat, axis=1)[:, :-1], 0.0)

    def test_loss_and_grads(self, batch, rng):
        x, _ = batch
        m = VMFNBMixtureVAE(label=self._label(rng))
        params = m.init(jax.random.PRNGKey(0))

        def loss_fn(p):
            o = m.forward(p, x, jax.random.PRNGKey(1))
            return mixture_composite_loss(x, o, 0.5, m.dd)

        val, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(val))
        assert all(
            np.all(np.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)
        )
        # mixture directions get gradient
        assert float(jnp.abs(grads["ln_vmf_mu"]).max()) > 0

    def test_jit_forward(self, batch, rng):
        x, _ = batch
        m = VMFNBMixtureVAE(label=self._label(rng))
        params = m.init(jax.random.PRNGKey(0))
        f = jax.jit(lambda p, x, k: m.forward(p, x, k, training=True))
        out = f(params, x, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out.nb_recon_mu)).all()
