"""Negative-binomial VAE for count matrices.

TPU-native reimplementation of the reference's NB-VAE
(include/models/nb.hh:200-548): two latent pathways — a deep mean (mu)
encoder/decoder and a shallow overdispersion (nu) pathway — plus a
learned scalar sequencing-depth head and linear covariate side channels.

Faithfully replicated quirks (SURVEY §7.3):

- learned input standardization ``(log1p(x) - x_mean)/(softplus(ln_x_sd)+1e-4)``
  with *trainable* x_mean / ln_x_sd (nb.hh:312-319, 403-417);
- posterior log-variance clamped to [-4, 4] (nb.hh:414);
- decoder mean = ``exp(log_softmax(h + hc + mu_bias))`` — a composition
  vector (nb.hh:433-442);
- overdispersion = ``clamp(softplus(nu_dec(z) - nu_bias), 1e-4, 1e4)``
  (nb.hh:453-460);
- eval-mode reparameterization returns the mean (nb.hh:462-472).

The model object holds static configuration; parameters live in a flat
dict keyed with the reference's parameter names so artifact dumps match.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.initializers import linear_apply, torch_linear_init
from .modules import apply_stack, init_linear_stack, reparameterize


class NBVAEOutput(NamedTuple):
    """Forward output (reference: nbvae_out_t, nb.hh:200-210)."""

    recon_mu: jax.Array
    recon_nu: jax.Array
    recon_depth: jax.Array
    mu_mean: jax.Array
    mu_lnvar: jax.Array
    nu_mean: jax.Array
    nu_lnvar: jax.Array


@dataclass(frozen=True)
class NBVAE:
    """Static model configuration (reference ctor: nb.hh:299-401)."""

    data_dim: int
    covar_dim: int
    mean_encoding: tuple[int, ...] = ()
    mean_decoding: tuple[int, ...] = ()
    mean_latent: int = 2
    overdisp_encoding: int = 1
    overdisp_latent: int = 1
    do_relu: bool = False

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        D, C = self.data_dim, self.covar_dim
        R = self.mean_latent
        keys = iter(jax.random.split(key, 16))
        params: dict = {
            "x_mean": jnp.zeros((1, D)),
            "ln_x_sd": jnp.ones((1, D)),
            "mu_bias": jnp.zeros((1, D)),
            "nu_bias": jnp.zeros((1, D)),
        }

        # mu encoder: hidden layers, or a single D->R map when none
        # (nb.hh:331-349)
        hidden = list(self.mean_encoding)
        enc_params, enc_names, d_prev = init_linear_stack(
            next(keys), "mu_encoding", D, hidden, R if not hidden else None
        )
        params.update(enc_params)

        params["covar_encoding"] = torch_linear_init(next(keys), C, R)
        params["mu_representation_mean"] = torch_linear_init(next(keys), d_prev, R)
        params["mu_representation_logvariance"] = torch_linear_init(
            next(keys), d_prev, R
        )

        # mu decoder: hidden layers plus the final map to D (nb.hh:364-379)
        dec_params, dec_names, _ = init_linear_stack(
            next(keys), "mu_decoding", R, list(self.mean_decoding), D
        )
        params.update(dec_params)

        params["covar_decoding"] = torch_linear_init(next(keys), C, D)

        # nu pathway (nb.hh:385-394)
        H, Rn = self.overdisp_encoding, self.overdisp_latent
        params["nu_encoding"] = torch_linear_init(next(keys), D, H)
        params["nu_representation_mean"] = torch_linear_init(next(keys), H, Rn)
        params["nu_representation_logvariance"] = torch_linear_init(
            next(keys), H, Rn
        )
        params["nu_decoding"] = torch_linear_init(next(keys), Rn, D)

        params["depth"] = torch_linear_init(next(keys), D, 1)
        return params

    # ------------------------------------------------------------------
    def _enc_names(self) -> list[str]:
        hidden = list(self.mean_encoding)
        if hidden:
            return [f"mu_encoding_{i + 1}" for i in range(len(hidden))]
        return ["mu_encoding"]

    def _dec_names(self) -> list[str]:
        hidden = list(self.mean_decoding)
        return [f"mu_decoding_{i + 1}" for i in range(len(hidden))] + [
            "mu_decoding"
        ]

    def _standardize(self, params: dict, x: jax.Array) -> jax.Array:
        eps = 1e-4
        x_sd = jax.nn.softplus(params["ln_x_sd"])
        return (jnp.log1p(x) - params["x_mean"]) / (x_sd + eps)

    def encode_mu(
        self, params: dict, x: jax.Array, c: jax.Array | None = None
    ) -> tuple[jax.Array, jax.Array]:
        """(mean, lnvar) of q(z_mu | x [, c]) — reference nb.hh:403-431."""
        xn = self._standardize(params, x)
        h = apply_stack(params, self._enc_names(), xn, self.do_relu, relu_last=True)
        lnvar = jnp.clip(
            linear_apply(params["mu_representation_logvariance"], h), -4.0, 4.0
        )
        mean = linear_apply(params["mu_representation_mean"], h)
        if c is not None:
            mean = mean + linear_apply(params["covar_encoding"], c)
        return mean, lnvar

    def decode_mu(self, params: dict, z: jax.Array, c: jax.Array) -> jax.Array:
        """Composition-vector decoder — reference nb.hh:433-442."""
        h = apply_stack(params, self._dec_names(), z, self.do_relu, relu_last=False)
        hc = linear_apply(params["covar_decoding"], c)
        return jnp.exp(
            jax.nn.log_softmax(h + hc + params["mu_bias"], axis=1)
        )

    def encode_nu(self, params: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Reference nb.hh:444-451 (note: no ReLU on the hidden layer)."""
        h = linear_apply(params["nu_encoding"], x)
        lnvar = jnp.clip(
            linear_apply(params["nu_representation_logvariance"], h), -4.0, 4.0
        )
        return linear_apply(params["nu_representation_mean"], h), lnvar

    def decode_nu(self, params: dict, z: jax.Array) -> jax.Array:
        """Reference nb.hh:453-460."""
        ret = jax.nn.softplus(linear_apply(params["nu_decoding"], z) - params["nu_bias"])
        return jnp.clip(ret, 1e-4, 1e4)

    def forward(
        self,
        params: dict,
        x: jax.Array,
        c: jax.Array,
        key: jax.Array,
        training: bool = True,
    ) -> NBVAEOutput:
        """Full forward pass (reference nb.hh:474-508)."""
        k_mu, k_nu = jax.random.split(key)

        mu_mean, mu_lnvar = self.encode_mu(params, x, c)
        z_mu = reparameterize(k_mu, mu_mean, mu_lnvar, training)
        recon_mu = self.decode_mu(params, z_mu, c)

        nu_mean, nu_lnvar = self.encode_nu(params, x)
        z_nu = reparameterize(k_nu, nu_mean, nu_lnvar, training)
        recon_nu = self.decode_nu(params, z_nu)

        depth = jax.nn.softplus(linear_apply(params["depth"], x))

        return NBVAEOutput(
            recon_mu, recon_nu, depth, mu_mean, mu_lnvar, nu_mean, nu_lnvar
        )

    # ------------------------------------------------------------------
    def fused_loss(
        self,
        params: dict,
        x: jax.Array,
        c: jax.Array,
        key: jax.Array,
        beta,
        training: bool = True,
        include_data_const: bool = True,
    ) -> jax.Array:
        """Whole NB-VAE loss with the decoder+likelihood block running in
        the fused Pallas kernel (:mod:`mmvae_tpu.ops.nb_elbo`).

        Numerically equivalent to ``nb_loss(x, self.forward(...), beta)``
        up to float reassociation; the kernel avoids materializing the
        (B, D) softmax/overdispersion intermediates.
        """
        from ..ops.losses import gaussian_kl
        from ..ops.nb_elbo import nb_nllik_fused

        k_mu, k_nu = jax.random.split(key)

        mu_mean, mu_lnvar = self.encode_mu(params, x, c)
        z_mu = reparameterize(k_mu, mu_mean, mu_lnvar, training)
        h = apply_stack(params, self._dec_names(), z_mu, self.do_relu,
                        relu_last=False)
        h = h + linear_apply(params["covar_decoding"], c) + params["mu_bias"]

        nu_mean, nu_lnvar = self.encode_nu(params, x)
        z_nu = reparameterize(k_nu, nu_mean, nu_lnvar, training)
        nu_pre = linear_apply(params["nu_decoding"], z_nu) - params["nu_bias"]

        depth = jax.nn.softplus(linear_apply(params["depth"], x))

        nll = nb_nllik_fused(x, h, nu_pre, depth, include_data_const)

        n = x.shape[0]
        total = nll
        total += gaussian_kl(mu_mean, mu_lnvar) * beta
        total += gaussian_kl(nu_mean, nu_lnvar) * beta
        return total / n

    # ------------------------------------------------------------------
    # v2 fused step: single-pass kernels (ops/nb_step.py).  Valid for
    # direct (no hidden layer) mu decoders — the default architecture;
    # falls back to fused_loss otherwise.
    # ------------------------------------------------------------------
    def _step_prelude(self, params, x, c, key, training=True):
        """Latents + stacked decoder-side arguments for ops.nb_step.

        Key split and encoder math are identical to ``fused_loss`` so
        the two paths are trajectory-equivalent up to the loss kernel's
        float reassociation.  Weights are stored (d_in, d_out), which is
        already the kernels' (rows, D) tiling layout."""
        from ..ops.losses import gaussian_kl

        k_mu, k_nu = jax.random.split(key)
        mu_mean, mu_lnvar = self.encode_mu(params, x, c)
        z_mu = reparameterize(k_mu, mu_mean, mu_lnvar, training)
        nu_mean, nu_lnvar = self.encode_nu(params, x)
        z_nu = reparameterize(k_nu, nu_mean, nu_lnvar, training)
        depth = jax.nn.softplus(linear_apply(params["depth"], x))

        dec = params["mu_decoding"]
        cov = params["covar_decoding"]
        nud = params["nu_decoding"]
        # weights are stored (d_in, d_out); the kernels tile (rows, D)
        kl = gaussian_kl(mu_mean, mu_lnvar) + gaussian_kl(nu_mean, nu_lnvar)
        return dict(
            z_mu=z_mu,
            z_nu=z_nu,
            depth=depth,
            wd=dec["weight"],
            wc=cov["weight"],
            bias2=dec["bias"] + cov["bias"] + params["mu_bias"][0],
            wn=nud["weight"],
            bias_n=nud["bias"] - params["nu_bias"][0],
            kl=kl,
        )

    def _can_fuse_step(self) -> bool:
        return not self.mean_decoding

    def fused_step_report(self, params, x, c, key, beta,
                          include_data_const: bool = True):
        """Reporting loss via the v2 single-pass kernels."""
        from ..ops.nb_step import nb_step_report

        if not self._can_fuse_step():
            return self.fused_loss(params, jnp.asarray(x, jnp.float32), c,
                                   key, beta, True, include_data_const)
        pre = self._step_prelude(params, x, c, key)
        nll = nb_step_report(
            x, pre["z_mu"], c, pre["z_nu"], pre["depth"],
            pre["wd"], pre["wc"], pre["bias2"], pre["wn"], pre["bias_n"],
            include_const=include_data_const,
        )
        n = x.shape[0]
        return (nll + beta * pre["kl"]) / n

    def fused_step_boot(self, params, x, c, key, beta,
                        need_value: bool = True):
        """Boot-step loss via the fused value+grad kernel.

        ``need_value=False`` (hot path: the trainer consumes only
        ``jax.grad`` of this) uses the grad-only kernel, which skips the
        primal's lgamma/log ops and returns only ``beta*kl/n`` plus a
        zero NLL — the gradient is identical."""
        from ..ops.nb_step import nb_step_boot, nb_step_boot_gradonly

        if not self._can_fuse_step():
            return self.fused_loss(params, jnp.asarray(x, jnp.float32), c,
                                   key, beta, True, include_data_const=False)
        pre = self._step_prelude(params, x, c, key)
        step = nb_step_boot if need_value else nb_step_boot_gradonly
        nll = step(
            x, pre["z_mu"], c, pre["z_nu"], pre["depth"],
            pre["wd"], pre["wc"], pre["bias2"], pre["wn"], pre["bias_n"],
        )
        n = x.shape[0]
        return (nll + beta * pre["kl"]) / n

    # ------------------------------------------------------------------
    # Tensor-parallel fused step (SURVEY §5.7): runs inside a shard_map
    # over ('data', 'model') where every D-sized parameter axis and x's
    # column axis are 'model' shards.  Encoder first layers decompose as
    # partial matmuls + psum; the step kernels run on local D slices
    # with their normalizer/row reductions psum'd (ops/nb_step.py).
    # ------------------------------------------------------------------
    def tp_pspecs(self, params: dict):
        """Name-aware TP PartitionSpecs (the shared rule set lives in
        :func:`~mmvae_tpu.parallel.mesh.feature_sharded_pspecs`)."""
        from ..parallel.mesh import feature_sharded_pspecs

        return feature_sharded_pspecs(
            params,
            row={self._enc_names()[0], "nu_encoding", "depth"},
            col={"mu_decoding", "covar_decoding", "nu_decoding"},
            flat={"x_mean", "ln_x_sd", "mu_bias", "nu_bias"},
        )

    def _tp_first_linear(self, p, xn, model_axis):
        """D-sharded Linear: local partial product, psum, replicated
        bias added once.  Identity-gradient psum: under
        check_vma=False the default transpose would double the
        gradient (see parallel/collectives.py)."""
        from ..parallel.collectives import psum_id_grad

        return psum_id_grad(xn @ p["weight"], model_axis) + p["bias"]

    def tp_encode_mu(self, params, x, c, model_axis):
        """encode_mu with the D->H first layer decomposed over shards;
        semantics identical to :meth:`encode_mu`."""
        xn = self._standardize(params, x)  # elementwise on local shards
        names = self._enc_names()
        h = self._tp_first_linear(params[names[0]], xn, model_axis)
        if self.do_relu:
            h = jax.nn.relu(h)  # encoder stacks ReLU every layer
        for name in names[1:]:
            h = linear_apply(params[name], h)
            if self.do_relu:
                h = jax.nn.relu(h)
        lnvar = jnp.clip(
            linear_apply(params["mu_representation_logvariance"], h),
            -4.0, 4.0,
        )
        mean = linear_apply(params["mu_representation_mean"], h)
        if c is not None:
            mean = mean + linear_apply(params["covar_encoding"], c)
        return mean, lnvar

    def tp_encode_nu(self, params, x, model_axis):
        h = self._tp_first_linear(params["nu_encoding"], x, model_axis)
        lnvar = jnp.clip(
            linear_apply(params["nu_representation_logvariance"], h),
            -4.0, 4.0,
        )
        return linear_apply(params["nu_representation_mean"], h), lnvar

    def _tp_step_prelude(self, params, x, c, key, model_axis,
                         training=True):
        from ..ops.losses import gaussian_kl

        k_mu, k_nu = jax.random.split(key)
        mu_mean, mu_lnvar = self.tp_encode_mu(params, x, c, model_axis)
        z_mu = reparameterize(k_mu, mu_mean, mu_lnvar, training)
        nu_mean, nu_lnvar = self.tp_encode_nu(params, x, model_axis)
        z_nu = reparameterize(k_nu, nu_mean, nu_lnvar, training)
        depth = jax.nn.softplus(
            self._tp_first_linear(params["depth"], x, model_axis)
        )
        dec = params["mu_decoding"]
        cov = params["covar_decoding"]
        nud = params["nu_decoding"]
        kl = gaussian_kl(mu_mean, mu_lnvar) + gaussian_kl(nu_mean, nu_lnvar)
        return dict(
            z_mu=z_mu,
            z_nu=z_nu,
            depth=depth,
            wd=dec["weight"],
            wc=cov["weight"],
            bias2=dec["bias"] + cov["bias"] + params["mu_bias"][0],
            wn=nud["weight"],
            bias_n=nud["bias"] - params["nu_bias"][0],
            kl=kl,
        )

    def fused_step_report_tp(self, params, x, c, key, beta,
                             model_axis="model",
                             include_data_const: bool = True):
        from ..ops.nb_step import nb_step_report

        assert self._can_fuse_step(), "TP fused step needs a direct decoder"
        pre = self._tp_step_prelude(params, x, c, key, model_axis)
        nll = nb_step_report(
            x, pre["z_mu"], c, pre["z_nu"], pre["depth"],
            pre["wd"], pre["wc"], pre["bias2"], pre["wn"], pre["bias_n"],
            include_const=include_data_const, model_axis=model_axis,
        )
        n = x.shape[0]
        return (nll + beta * pre["kl"]) / n

    def fused_step_boot_tp(self, params, x, c, key, beta,
                           model_axis="model", need_value: bool = True):
        from ..ops.nb_step import nb_step_boot_tp, nb_step_boot_tp_gradonly

        assert self._can_fuse_step(), "TP fused step needs a direct decoder"
        pre = self._tp_step_prelude(params, x, c, key, model_axis)
        step = nb_step_boot_tp if need_value else nb_step_boot_tp_gradonly
        nll = step(
            model_axis, x, pre["z_mu"], c, pre["z_nu"], pre["depth"],
            pre["wd"], pre["wc"], pre["bias2"], pre["wn"], pre["bias_n"],
        )
        n = x.shape[0]
        return (nll + beta * pre["kl"]) / n
