"""von Mises-Fisher VAE: likelihood on the unit sphere.

TPU-native reimplementation of the reference's vMF-VAE
(include/models/vmf.hh:191-440).  Data rows are L2-normalized after
log1p; the encoder stack uses Angular (direction-only) layers; the
decoder is ``normalize(exp(dec(z)) + covar_dec(c))``; a single *learned*
scalar ``ln_kappa`` is exponentiated and clamped to
``[kappa_min, kappa_max]``.

Quirks preserved: encoder standardization eps = 1e-2 / D
(vmf.hh:253-258); lnvar clamp +-4; ln_kappa initialized to
log(kappa_min) (vmf.hh:323); eval-mode reparameterization = mean; the
covariate decoder parameter name keeps the reference's trailing
underscore ``covar_decoding_`` (vmf.hh:388) for artifact parity.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.initializers import linear_apply, torch_linear_init
from ..ops.losses import l2_normalize
from .modules import apply_stack, init_linear_stack, reparameterize


class VMFVAEOutput(NamedTuple):
    """Reference: vmf_vae_out_t (vmf.hh:191-196)."""

    recon: jax.Array
    mean: jax.Array
    lnvar: jax.Array
    kappa: jax.Array


@dataclass(frozen=True)
class VMFVAE:
    """Static configuration (reference ctor: vmf.hh:307-389)."""

    data_dim: int
    covar_dim: int
    latent: int = 2
    encoding: tuple[int, ...] = ()
    decoding: tuple[int, ...] = ()
    kappa_min: float = 0.1
    kappa_max: float = 10.0
    do_relu: bool = False

    def init(self, key: jax.Array) -> dict:
        D, C, Z = self.data_dim, self.covar_dim, self.latent
        keys = iter(jax.random.split(key, 8))
        params: dict = {
            "x_mean": jnp.zeros((1, D)),
            "ln_x_sd": jnp.ones((1, D)),
            "ln_kappa": jnp.full((1,), math.log(self.kappa_min)),
        }

        hidden = list(self.encoding)
        enc_params, _, d_prev = init_linear_stack(
            next(keys), "encoding", D, hidden, Z if not hidden else None,
            angular=True,
        )
        params.update(enc_params)

        params["covar_encoding"] = torch_linear_init(next(keys), C, Z)
        params["representation_mean"] = torch_linear_init(next(keys), d_prev, Z)
        params["representation_logvariance"] = torch_linear_init(
            next(keys), d_prev, Z
        )

        dec_params, _, _ = init_linear_stack(
            next(keys), "decoding", Z, list(self.decoding), D
        )
        params.update(dec_params)
        params["covar_decoding_"] = torch_linear_init(next(keys), C, D)
        return params

    def _enc_names(self) -> list[str]:
        hidden = list(self.encoding)
        if hidden:
            return [f"encoding_{i + 1}" for i in range(len(hidden))]
        return ["encoding"]

    def _dec_names(self) -> list[str]:
        hidden = list(self.decoding)
        return [f"decoding_{i + 1}" for i in range(len(hidden))] + ["decoding"]

    def _standardize(self, params: dict, x: jax.Array) -> jax.Array:
        eps = 1e-2 / float(x.shape[1])
        xn = l2_normalize(jnp.log1p(x), axis=1)
        return (xn - params["x_mean"]) / (
            jax.nn.softplus(params["ln_x_sd"]) + eps
        )

    def encode(
        self, params: dict, x: jax.Array, c: jax.Array | None = None
    ) -> tuple[jax.Array, jax.Array]:
        """Reference vmf.hh:250-281; encoder layers are Angular."""
        xn = self._standardize(params, x)
        h = apply_stack(
            params, self._enc_names(), xn, self.do_relu, relu_last=True,
            angular=True,
        )
        lnvar = jnp.clip(
            linear_apply(params["representation_logvariance"], h), -4.0, 4.0
        )
        mean = linear_apply(params["representation_mean"], h)
        if c is not None:
            mean = mean + linear_apply(params["covar_encoding"], c)
        return mean, lnvar

    def decode(self, params: dict, z: jax.Array, c: jax.Array) -> jax.Array:
        """Reference vmf.hh:283-290."""
        h = jnp.exp(
            apply_stack(params, self._dec_names(), z, self.do_relu, relu_last=False)
        )
        hc = linear_apply(params["covar_decoding_"], c)
        return l2_normalize(h + hc, axis=1)

    def forward(
        self,
        params: dict,
        x: jax.Array,
        c: jax.Array,
        key: jax.Array,
        training: bool = True,
    ) -> VMFVAEOutput:
        """Reference vmf.hh:292-304."""
        mean, lnvar = self.encode(params, x, c)
        z = reparameterize(key, mean, lnvar, training)
        recon = self.decode(params, z, c)
        kappa = jnp.clip(
            jnp.exp(params["ln_kappa"]), self.kappa_min, self.kappa_max
        )
        return VMFVAEOutput(recon, mean, lnvar, kappa)

    # ------------------------------------------------------------------
    # Tensor-parallel step (SURVEY §5.7): D sharded over 'model'.  The
    # whole model is XLA (no Pallas kernel), so TP is pure sharded
    # linear algebra: the Angular first layer's per-unit weight norms
    # and the partial matmul psum over the axis; the decoder is
    # column-parallel with a psum'd row L2 norm; kappa/latents stay
    # replicated.  Semantics identical to the replicated forward+loss.
    # ------------------------------------------------------------------
    def tp_pspecs(self, params: dict):
        """Name-aware TP PartitionSpecs (shared rules:
        :func:`~mmvae_tpu.parallel.mesh.feature_sharded_pspecs`).  The
        Angular encoder first layer is a (D, H) row shard with no bias;
        ``ln_kappa`` is a replicated scalar."""
        from ..parallel.mesh import feature_sharded_pspecs

        return feature_sharded_pspecs(
            params,
            row={self._enc_names()[0]},
            col={self._dec_names()[-1], "covar_decoding_"},
            flat={"x_mean", "ln_x_sd"},
        )

    def tp_standardize(self, params, x, model_axis):
        from ..parallel.collectives import tp_l2_normalize

        eps = 1e-2 / float(self.data_dim)
        xn = tp_l2_normalize(jnp.log1p(x), model_axis, axis=1,
                             differentiated=False)
        return (xn - params["x_mean"]) / (
            jax.nn.softplus(params["ln_x_sd"]) + eps
        )

    def tp_encode(self, params, x, c, model_axis):
        from ..parallel.collectives import psum_id_grad, tp_l2_normalize
        from .modules import angular_apply

        xn = self.tp_standardize(params, x, model_axis)
        names = self._enc_names()
        # Angular first layer: per-output-unit weight L2 norms span the
        # sharded D axis (psum'd); the matmul is a psum'd partial
        # product (angular.hh:34-42 semantics, eps=1e-4, no bias)
        ww = tp_l2_normalize(
            jax.nn.relu(params[names[0]]["weight"]) + 1e-4, model_axis,
            axis=0,
        )
        h = psum_id_grad(xn @ ww, model_axis)
        if self.do_relu:
            h = jax.nn.relu(h)
        for name in names[1:]:
            h = angular_apply(params[name], h)
            if self.do_relu:
                h = jax.nn.relu(h)
        lnvar = jnp.clip(
            linear_apply(params["representation_logvariance"], h), -4.0, 4.0
        )
        mean = linear_apply(params["representation_mean"], h)
        if c is not None:
            mean = mean + linear_apply(params["covar_encoding"], c)
        return mean, lnvar

    def tp_decode(self, params, z, c, model_axis):
        from ..parallel.collectives import psum_grad, tp_l2_normalize

        names = self._dec_names()
        h = z
        for name in names[:-1]:
            h = linear_apply(params[name], h)
            if self.do_relu:
                h = jax.nn.relu(h)
        # replicated -> column-sharded boundary: the final layer's
        # consumers are shard-local, so the cotangent flowing back into
        # the replicated stack must be psum'd (see collectives.psum_grad)
        h = psum_grad(h, model_axis)
        h = jnp.exp(linear_apply(params[names[-1]], h))
        hc = linear_apply(params["covar_decoding_"], c)
        return tp_l2_normalize(h + hc, model_axis, axis=1)

    def tp_step_loss(self, params, x, c, key, beta, model_axis="model"):
        """Full TP loss (reference vmf_vae_loss, vmf.hh:419-440) for use
        as both the report and boot override of a TP-shard_map Trainer."""
        from ..ops.fastmath import fasterlog
        from ..ops.lbessel import lbessel
        from ..ops.losses import gaussian_kl
        from ..parallel.collectives import psum_id_grad, tp_l2_normalize

        mean, lnvar = self.tp_encode(params, x, c, model_axis)
        z = reparameterize(key, mean, lnvar, True)
        recon = self.tp_decode(params, z, c, model_axis)
        kappa = jnp.clip(
            jnp.exp(params["ln_kappa"]), self.kappa_min, self.kappa_max
        )

        dd = float(self.data_dim)
        eps = 1e-2 / dd
        yobs = tp_l2_normalize(jnp.log1p(jax.nn.relu(x)) + eps, model_axis,
                               axis=1, differentiated=False)
        n = x.shape[0]
        df = max(0.5 * dd - 1.0, 0.0)
        kl = gaussian_kl(mean, lnvar)
        llik = psum_id_grad(
            jnp.sum(yobs * recon, axis=1), model_axis
        ) * kappa
        llik += df * jnp.log(kappa) - lbessel(kappa, df)
        llik -= 0.5 * dd * fasterlog(2.0 * math.pi)
        return kl / n * beta - jnp.sum(llik) / n
