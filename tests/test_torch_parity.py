"""Numerical parity vs a LibTorch replica of the reference NB-VAE.

Builds the reference's exact model (include/models/nb.hh semantics) in
torch, loads OUR initialized parameters into it, and compares forward
losses and parameter gradients on the same batch in eval mode (where
reparameterization returns the mean, nb.hh:469-471, so everything is
deterministic).  Any systematic formula difference shows up here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops.losses import nb_loss

D, C, B = 50, 1, 16


class TorchNBVAE(torch.nn.Module):
    """Reference nbvae_tImpl with default dims (no hidden layers),
    transliterated from the formulas in nb.hh:299-548."""

    def __init__(self, latent=2, nu_h=1, nu_r=1):
        super().__init__()
        self.x_mean = torch.nn.Parameter(torch.zeros(1, D))
        self.ln_x_sd = torch.nn.Parameter(torch.ones(1, D))
        self.mu_bias = torch.nn.Parameter(torch.zeros(1, D))
        self.nu_bias = torch.nn.Parameter(torch.zeros(1, D))
        self.mu_enc = torch.nn.Linear(D, latent)
        self.covar_enc = torch.nn.Linear(C, latent)
        self.mu_repr_mean = torch.nn.Linear(latent, latent)
        self.mu_repr_lnvar = torch.nn.Linear(latent, latent)
        self.mu_dec = torch.nn.Linear(latent, D)
        self.covar_dec = torch.nn.Linear(C, D)
        self.nu_enc = torch.nn.Linear(D, nu_h)
        self.nu_repr_mean = torch.nn.Linear(nu_h, nu_r)
        self.nu_repr_lnvar = torch.nn.Linear(nu_h, nu_r)
        self.nu_dec = torch.nn.Linear(nu_r, D)
        self.depth = torch.nn.Linear(D, 1)

    def forward(self, x, c):
        eps = 1e-4
        x_sd = torch.nn.functional.softplus(self.ln_x_sd)
        xn = (torch.log1p(x) - self.x_mean) / (x_sd + eps)
        h = self.mu_enc(xn)
        hc = self.covar_enc(c)
        mu_mean = self.mu_repr_mean(h) + hc
        mu_lnvar = torch.clamp(self.mu_repr_lnvar(h), -4.0, 4.0)
        z = mu_mean  # eval mode
        hdec = self.mu_dec(z) + self.covar_dec(c) + self.mu_bias
        recon_mu = torch.exp(torch.log_softmax(hdec, 1))

        hn = self.nu_enc(x)
        nu_mean = self.nu_repr_mean(hn)
        nu_lnvar = torch.clamp(self.nu_repr_lnvar(hn), -4.0, 4.0)
        recon_nu = torch.clamp(
            torch.nn.functional.softplus(self.nu_dec(nu_mean) - self.nu_bias),
            1e-4, 1e4,
        )
        d = torch.nn.functional.softplus(self.depth(x))
        return recon_mu, recon_nu, d, mu_mean, mu_lnvar, nu_mean, nu_lnvar


def torch_loss(x, out, kl_weight):
    recon_mu, recon_nu, d, mu_mean, mu_lnvar, nu_mean, nu_lnvar = out
    eps = 1e-4
    nu = recon_nu + eps
    mu = recon_mu * d + eps
    lg = torch.lgamma(nu) + torch.lgamma(x + 1.0) - torch.lgamma(nu + x)
    denom = torch.log(mu + nu)
    pr = x * (denom - torch.log(mu)) + nu * (denom - torch.log(nu))
    nll = torch.sum(lg + pr)
    kl = -0.5 * torch.sum(1 + mu_lnvar - mu_mean**2 - torch.exp(mu_lnvar))
    kl += -0.5 * torch.sum(1 + nu_lnvar - nu_mean**2 - torch.exp(nu_lnvar))
    return (nll + kl * kl_weight) / x.shape[0]


def _copy_params(params, tm):
    """Load our pytree into the torch replica (weights transposed)."""
    with torch.no_grad():
        def W(name):
            return torch.tensor(np.asarray(params[name]["weight"]).T)

        def bias(name):
            return torch.tensor(np.asarray(params[name]["bias"]))

        tm.x_mean.copy_(torch.tensor(np.asarray(params["x_mean"])))
        tm.ln_x_sd.copy_(torch.tensor(np.asarray(params["ln_x_sd"])))
        tm.mu_bias.copy_(torch.tensor(np.asarray(params["mu_bias"])))
        tm.nu_bias.copy_(torch.tensor(np.asarray(params["nu_bias"])))
        pairs = [
            (tm.mu_enc, "mu_encoding"), (tm.covar_enc, "covar_encoding"),
            (tm.mu_repr_mean, "mu_representation_mean"),
            (tm.mu_repr_lnvar, "mu_representation_logvariance"),
            (tm.mu_dec, "mu_decoding"), (tm.covar_dec, "covar_decoding"),
            (tm.nu_enc, "nu_encoding"),
            (tm.nu_repr_mean, "nu_representation_mean"),
            (tm.nu_repr_lnvar, "nu_representation_logvariance"),
            (tm.nu_dec, "nu_decoding"), (tm.depth, "depth"),
        ]
        for mod, name in pairs:
            mod.weight.copy_(W(name))
            mod.bias.copy_(bias(name))


@pytest.fixture()
def setup(rng):
    model = NBVAE(data_dim=D, covar_dim=C)
    params = model.init(jax.random.PRNGKey(3))
    tm = TorchNBVAE()
    _copy_params(params, tm)
    x = rng.poisson(2.0, size=(B, D)).astype(np.float32)
    c = np.ones((B, C), np.float32)
    return model, params, tm, x, c


def test_eval_forward_loss_matches_torch(setup):
    model, params, tm, x, c = setup
    beta = 0.37

    tx = torch.tensor(x)
    tout = tm(tx, torch.tensor(c))
    want = float(torch_loss(tx, tout, beta))

    out = model.forward(params, jnp.asarray(x), jnp.asarray(c),
                        jax.random.PRNGKey(0), training=False)
    got = float(nb_loss(jnp.asarray(x), out, beta))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_eval_gradients_match_torch(setup):
    model, params, tm, x, c = setup
    beta = 0.37

    tx = torch.tensor(x)
    loss_t = torch_loss(tx, tm(tx, torch.tensor(c)), beta)
    loss_t.backward()

    def loss_fn(p):
        out = model.forward(p, jnp.asarray(x), jnp.asarray(c),
                            jax.random.PRNGKey(0), training=False)
        return nb_loss(jnp.asarray(x), out, beta)

    grads = jax.grad(loss_fn)(params)

    checks = [
        ("x_mean", tm.x_mean), ("ln_x_sd", tm.ln_x_sd),
        ("mu_bias", tm.mu_bias), ("nu_bias", tm.nu_bias),
    ]
    for name, tparam in checks:
        g = np.asarray(grads[name])
        w = tparam.grad.numpy()
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-5, err_msg=name)

    mod_checks = [
        ("mu_encoding", tm.mu_enc), ("mu_decoding", tm.mu_dec),
        ("nu_decoding", tm.nu_dec), ("depth", tm.depth),
        ("covar_decoding", tm.covar_dec),
    ]
    for name, mod in mod_checks:
        g = np.asarray(grads[name]["weight"]).T
        w = mod.weight.grad.numpy()
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-5, err_msg=name)


def test_fused_loss_matches_torch(setup):
    """The fused Pallas path (XLA fallback on CPU) against torch."""
    model, params, tm, x, c = setup
    beta = 0.37
    tx = torch.tensor(x)
    want = float(torch_loss(tx, tm(tx, torch.tensor(c)), beta))
    got = float(model.fused_loss(params, jnp.asarray(x), jnp.asarray(c),
                                 jax.random.PRNGKey(0), beta,
                                 training=False, include_data_const=True))
    np.testing.assert_allclose(got, want, rtol=2e-5)
