"""Joint vMF + NB VAE: two likelihoods on the same data, shared encoder.

TPU-native reimplementation of the reference's joint model
(include/models/vmfnb.hh:241-758): a shared Gaussian latent (from the NB
mu encoder) drives both an NB decoder and a vMF decoder; kappa is a
*per-sample* linear head on x.

Quirks preserved (they differ from the standalone NB/vMF models):

- the NB encoder input is L2-normalized after log1p with eps = 1e-2
  (``normalize_nb_x``, vmfnb.hh:601-611) — unlike nb.hh;
- ``mu_bias`` is added *outside* log_softmax (vmfnb.hh:466) — unlike
  nb.hh:440 where it is inside;
- nu decoding is ``clamp(exp(.), 0, 1e4)`` (vmfnb.hh:488-493) — exp,
  not softplus, and a 0 lower clamp;
- the nu encoder hidden layer IS ReLU'd (vmfnb.hh:481) — unlike nb.hh;
- the two decoders draw *independent* reparameterization noise from the
  same shared posterior (vmfnb.hh:519,533).

Known deviation: the reference's ``vmf_loss`` multiplies a shape-(n,)
row-sum by the (n,1) kappa head, which broadcasts to an (n,n) outer
product before the final sum (vmfnb.hh:569) — an apparent latent bug in
a driver that is disabled upstream (src/backup/vmfnb_vae_main.cc).  We
compute the per-sample quantity instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.initializers import linear_apply, torch_linear_init
from ..ops.lbessel import lbessel
from ..ops.losses import gaussian_kl, l2_normalize
from .modules import apply_stack, init_linear_stack, reparameterize


class VMFNBVAEOutput(NamedTuple):
    """Reference: vmfnb_vae_out_t (vmfnb.hh:241-255)."""

    nb_recon_mu: jax.Array
    nb_recon_nu: jax.Array
    nb_recon_depth: jax.Array
    nb_mu_mean: jax.Array
    nb_mu_lnvar: jax.Array
    nb_nu_mean: jax.Array
    nb_nu_lnvar: jax.Array
    vmf_recon: jax.Array
    vmf_kappa: jax.Array


@dataclass(frozen=True)
class VMFNBVAE:
    """Static configuration (reference ctor: vmfnb.hh:335-447)."""

    data_dim: int
    mean_encoding: tuple[int, ...] = ()
    mean_decoding: tuple[int, ...] = ()
    vmf_decoding: tuple[int, ...] = ()
    mean_latent: int = 2
    overdisp_encoding: int = 1
    overdisp_latent: int = 1
    kappa_min: float = 0.1
    kappa_max: float = 10.0
    do_relu: bool = False
    nu_max: float = 1e4

    def init(self, key: jax.Array) -> dict:
        D, R = self.data_dim, self.mean_latent
        keys = iter(jax.random.split(key, 16))
        params: dict = {
            "x_mean": jnp.zeros((1, D)),
            "ln_x_sd": jnp.ones((1, D)),
            "mu_bias": jnp.zeros((1, D)),
            "nu_bias": jnp.zeros((1, D)),
        }
        hidden = list(self.mean_encoding)
        enc_params, _, d_prev = init_linear_stack(
            next(keys), "nb_mu_encoding", D, hidden, R if not hidden else None
        )
        params.update(enc_params)
        params["nb_mu_representation_mean"] = torch_linear_init(next(keys), d_prev, R)
        params["nb_mu_representation_logvariance"] = torch_linear_init(
            next(keys), d_prev, R
        )
        dec_params, _, _ = init_linear_stack(
            next(keys), "nb_mu_decoding", R, list(self.mean_decoding), D
        )
        params.update(dec_params)

        H, Rn = self.overdisp_encoding, self.overdisp_latent
        params["nb_nu_encoding"] = torch_linear_init(next(keys), D, H)
        params["nb_nu_representation_mean"] = torch_linear_init(next(keys), H, Rn)
        params["nb_nu_representation_logvariance"] = torch_linear_init(
            next(keys), H, Rn
        )
        params["nb_nu_decoding"] = torch_linear_init(next(keys), Rn, D)
        params["depth"] = torch_linear_init(next(keys), D, 1)

        params["ln_kappa"] = torch_linear_init(next(keys), D, 1)
        vdec_params, _, _ = init_linear_stack(
            next(keys), "vmf_mu_decoding", R, list(self.vmf_decoding), D
        )
        params.update(vdec_params)
        return params

    def _enc_names(self) -> list[str]:
        hidden = list(self.mean_encoding)
        if hidden:
            return [f"nb_mu_encoding_{i + 1}" for i in range(len(hidden))]
        return ["nb_mu_encoding"]

    def _dec_names(self) -> list[str]:
        hidden = list(self.mean_decoding)
        return [f"nb_mu_decoding_{i + 1}" for i in range(len(hidden))] + [
            "nb_mu_decoding"
        ]

    def _vdec_names(self) -> list[str]:
        hidden = list(self.vmf_decoding)
        return [f"vmf_mu_decoding_{i + 1}" for i in range(len(hidden))] + [
            "vmf_mu_decoding"
        ]

    def normalize_nb_x(self, params: dict, x: jax.Array) -> jax.Array:
        """Reference vmfnb.hh:601-611 (eps = 1e-2, not scaled by D)."""
        eps = 1e-2
        xn = l2_normalize(jnp.log1p(x), axis=1)
        return (xn - params["x_mean"]) / (
            jax.nn.softplus(params["ln_x_sd"]) + eps
        )

    def shared_encode_mu(
        self, params: dict, x: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Reference vmfnb.hh:449-460."""
        h = apply_stack(
            params, self._enc_names(), self.normalize_nb_x(params, x),
            self.do_relu, relu_last=True,
        )
        lnvar = jnp.clip(
            linear_apply(params["nb_mu_representation_logvariance"], h), -4.0, 4.0
        )
        return linear_apply(params["nb_mu_representation_mean"], h), lnvar

    def nb_decode_mu(self, params: dict, z: jax.Array) -> jax.Array:
        """mu_bias OUTSIDE log_softmax (vmfnb.hh:462-467)."""
        h = apply_stack(params, self._dec_names(), z, self.do_relu, relu_last=False)
        return jnp.exp(jax.nn.log_softmax(h, axis=1) + params["mu_bias"])

    def vmf_decode_mu(self, params: dict, z: jax.Array) -> jax.Array:
        """Reference vmfnb.hh:469-475."""
        h = apply_stack(params, self._vdec_names(), z, self.do_relu, relu_last=False)
        return l2_normalize(h, axis=1)

    def nb_encode_nu(self, params: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """ReLU'd hidden layer (vmfnb.hh:477-486)."""
        h = jax.nn.relu(linear_apply(params["nb_nu_encoding"], x))
        lnvar = jnp.clip(
            linear_apply(params["nb_nu_representation_logvariance"], h), -4.0, 4.0
        )
        return linear_apply(params["nb_nu_representation_mean"], h), lnvar

    def nb_decode_nu(self, params: dict, z: jax.Array) -> jax.Array:
        """exp (not softplus), lower clamp 0 (vmfnb.hh:488-493)."""
        ret = jnp.exp(linear_apply(params["nb_nu_decoding"], z) - params["nu_bias"])
        return jnp.clip(ret, 0.0, self.nu_max)

    def kappa_head(self, params: dict, x: jax.Array) -> jax.Array:
        """Per-sample kappa, clamped with fasterlog bounds
        (vmfnb.hh:535-538)."""
        from ..ops.fastmath import fasterlog

        return jnp.exp(
            jnp.clip(
                linear_apply(params["ln_kappa"], x),
                fasterlog(self.kappa_min),
                fasterlog(self.kappa_max),
            )
        )

    def forward(
        self,
        params: dict,
        x: jax.Array,
        key: jax.Array,
        training: bool = True,
    ) -> VMFNBVAEOutput:
        """Reference vmfnb.hh:506-549."""
        k_nb, k_nu, k_vmf = jax.random.split(key, 3)
        mu_mean, mu_lnvar = self.shared_encode_mu(params, x)

        nb_mu = self.nb_decode_mu(
            params, reparameterize(k_nb, mu_mean, mu_lnvar, training)
        )
        nu_mean, nu_lnvar = self.nb_encode_nu(params, x)
        nb_nu = self.nb_decode_nu(
            params, reparameterize(k_nu, nu_mean, nu_lnvar, training)
        )
        depth = jax.nn.softplus(linear_apply(params["depth"], x))

        vmf_recon = self.vmf_decode_mu(
            params, reparameterize(k_vmf, mu_mean, mu_lnvar, training)
        )
        kappa = self.kappa_head(params, x)
        return VMFNBVAEOutput(
            nb_mu, nb_nu, depth, mu_mean, mu_lnvar, nu_mean, nu_lnvar,
            vmf_recon, kappa,
        )

    # ------------------------------------------------------------------
    # Fused step path: the NB half (direct decoder + likelihood) runs in
    # the single-pass Pallas kernels (ops/nb_step.py, joint variant with
    # pb-outside-softmax and exp-nu); the vMF half stays in XLA.
    # ------------------------------------------------------------------
    def _can_fuse_step(self) -> bool:
        from ..ops.nb_elbo import NU_HI

        # the kernels bake NU_HI as the nu clamp; a non-default nu_max
        # must use the XLA path to keep the configured semantics
        return not self.mean_decoding and self.nu_max == NU_HI

    def _step_prelude(self, params, x, key, training=True):
        """Latents + stacked kernel args; key split and encoder math
        identical to :meth:`forward`."""
        k_nb, k_nu, k_vmf = jax.random.split(key, 3)
        mu_mean, mu_lnvar = self.shared_encode_mu(params, x)
        z_nb = reparameterize(k_nb, mu_mean, mu_lnvar, training)
        nu_mean, nu_lnvar = self.nb_encode_nu(params, x)
        z_nu = reparameterize(k_nu, nu_mean, nu_lnvar, training)
        depth = jax.nn.softplus(linear_apply(params["depth"], x))

        vmf_recon = self.vmf_decode_mu(
            params, reparameterize(k_vmf, mu_mean, mu_lnvar, training)
        )
        kappa = self.kappa_head(params, x)
        kl = gaussian_kl(mu_mean, mu_lnvar) + gaussian_kl(nu_mean, nu_lnvar)

        dec = params["nb_mu_decoding"]
        nud = params["nb_nu_decoding"]
        return dict(
            z_nb=z_nb,
            z_nu=z_nu,
            depth=depth,
            wd=dec["weight"],
            bias2=dec["bias"],
            wn=nud["weight"],
            bias_n=nud["bias"] - params["nu_bias"][0],
            pb=params["mu_bias"][0],
            vmf_recon=vmf_recon,
            kappa=kappa,
            kl=kl,
        )

    def _zero_covar(self, x):
        # the joint model has no covariate pathway; the kernels expect a
        # (B, C) covariate and its (C, D) weight — feed zeros.  The
        # weight width follows x (= the LOCAL feature shard under TP).
        B = x.shape[0]
        return (jnp.zeros((B, 1), jnp.float32),
                jnp.zeros((1, x.shape[1]), jnp.float32))

    def fused_step_report(self, params, x, c, key, beta,
                          include_data_const: bool = True):
        from ..ops.nb_step import nb_step_report

        if not self._can_fuse_step():
            out = self.forward(params, jnp.asarray(x, jnp.float32), key,
                               True)
            return vmfnb_composite_loss(x, out, beta)
        pre = self._step_prelude(params, x, key)
        cz, wcz = self._zero_covar(x)
        nll = nb_step_report(
            x, pre["z_nb"], cz, pre["z_nu"], pre["depth"],
            pre["wd"], wcz, pre["bias2"], pre["wn"], pre["bias_n"],
            include_const=include_data_const, pb=pre["pb"], nu_exp=True,
        )
        vmf = vmf_nllik_parts(x, pre["vmf_recon"], pre["kappa"])
        n = x.shape[0]
        return (nll + vmf + beta * pre["kl"]) / n

    def fused_step_boot(self, params, x, c, key, beta,
                        need_value: bool = True):
        from ..ops.nb_step import (
            nb_step_boot_joint,
            nb_step_boot_joint_gradonly,
        )

        if not self._can_fuse_step():
            out = self.forward(params, jnp.asarray(x, jnp.float32), key,
                               True)
            return vmfnb_composite_loss(x, out, beta)
        pre = self._step_prelude(params, x, key)
        cz, wcz = self._zero_covar(x)
        step = (nb_step_boot_joint if need_value
                else nb_step_boot_joint_gradonly)
        nll = step(
            x, pre["z_nb"], cz, pre["z_nu"], pre["depth"],
            pre["wd"], wcz, pre["bias2"], pre["wn"], pre["bias_n"],
            pre["pb"],
        )
        vmf = vmf_nllik_parts(x, pre["vmf_recon"], pre["kappa"])
        n = x.shape[0]
        return (nll + vmf + beta * pre["kl"]) / n

    # ------------------------------------------------------------------
    # Tensor-parallel fused step (SURVEY §5.7): runs inside a shard_map
    # over ('data', 'model') where every D-sized parameter axis and x's
    # column axis are 'model' shards.  D-input heads (shared encoder
    # first layer, nu encoder, depth, kappa) decompose as partial
    # matmuls + identity-gradient psum; the NB half runs the joint
    # kernel variant with its normalizer/row reductions psum'd
    # (ops/nb_step.py); the vMF decoder is column-parallel with a
    # psum'd L2 norm.  Semantics identical to the replicated step.
    # ------------------------------------------------------------------
    def tp_pspecs(self, params: dict):
        """Name-aware TP PartitionSpecs (shared rules:
        :func:`~mmvae_tpu.parallel.mesh.feature_sharded_pspecs`)."""
        from ..parallel.mesh import feature_sharded_pspecs

        return feature_sharded_pspecs(
            params,
            row={self._enc_names()[0], "nb_nu_encoding", "depth",
                 "ln_kappa"},
            col={"nb_mu_decoding", "nb_nu_decoding",
                 self._vdec_names()[-1]},
            flat={"x_mean", "ln_x_sd", "mu_bias", "nu_bias"},
        )

    def _tp_first_linear(self, p, xn, model_axis):
        from ..parallel.collectives import psum_id_grad

        return psum_id_grad(xn @ p["weight"], model_axis) + p["bias"]

    def tp_normalize_nb_x(self, params, x, model_axis):
        """:meth:`normalize_nb_x` with the row L2 norm psum'd over the
        feature shards (x is data: plain psum)."""
        from ..parallel.collectives import tp_l2_normalize

        eps = 1e-2
        xn = tp_l2_normalize(jnp.log1p(x), model_axis, axis=1,
                             differentiated=False)
        return (xn - params["x_mean"]) / (
            jax.nn.softplus(params["ln_x_sd"]) + eps
        )

    def tp_shared_encode_mu(self, params, x, model_axis):
        names = self._enc_names()
        h = self._tp_first_linear(
            params[names[0]], self.tp_normalize_nb_x(params, x, model_axis),
            model_axis,
        )
        if self.do_relu:
            h = jax.nn.relu(h)  # encoder stacks ReLU every layer
        for name in names[1:]:
            h = linear_apply(params[name], h)
            if self.do_relu:
                h = jax.nn.relu(h)
        lnvar = jnp.clip(
            linear_apply(params["nb_mu_representation_logvariance"], h),
            -4.0, 4.0,
        )
        return linear_apply(params["nb_mu_representation_mean"], h), lnvar

    def tp_nb_encode_nu(self, params, x, model_axis):
        h = jax.nn.relu(
            self._tp_first_linear(params["nb_nu_encoding"], x, model_axis)
        )
        lnvar = jnp.clip(
            linear_apply(params["nb_nu_representation_logvariance"], h),
            -4.0, 4.0,
        )
        return linear_apply(params["nb_nu_representation_mean"], h), lnvar

    def tp_vmf_decode_mu(self, params, z, model_axis):
        """Column-parallel vMF decoder: hidden layers are replicated,
        the final H->D map yields the local column shard, and the row
        L2 norm is psum-combined."""
        from ..parallel.collectives import psum_grad, tp_l2_normalize

        names = self._vdec_names()
        h = z
        for name in names[:-1]:
            h = linear_apply(params[name], h)
            if self.do_relu:
                h = jax.nn.relu(h)
        # replicated -> column-sharded boundary (collectives.psum_grad):
        # the shared latent's cotangent from this branch is partial per
        # shard and must be globally summed before it re-enters the
        # replicated encoder
        h = psum_grad(h, model_axis)
        h = linear_apply(params[names[-1]], h)
        return tp_l2_normalize(h, model_axis, axis=1)

    def tp_kappa_head(self, params, x, model_axis):
        from ..ops.fastmath import fasterlog

        pre = self._tp_first_linear(params["ln_kappa"], x, model_axis)
        return jnp.exp(
            jnp.clip(pre, fasterlog(self.kappa_min),
                     fasterlog(self.kappa_max))
        )

    def _tp_step_prelude(self, params, x, key, model_axis, training=True):
        """TP mirror of :meth:`_step_prelude` — same key split, same
        formulas, D-wide ops decomposed over the axis."""
        k_nb, k_nu, k_vmf = jax.random.split(key, 3)
        mu_mean, mu_lnvar = self.tp_shared_encode_mu(params, x, model_axis)
        z_nb = reparameterize(k_nb, mu_mean, mu_lnvar, training)
        nu_mean, nu_lnvar = self.tp_nb_encode_nu(params, x, model_axis)
        z_nu = reparameterize(k_nu, nu_mean, nu_lnvar, training)
        depth = jax.nn.softplus(
            self._tp_first_linear(params["depth"], x, model_axis)
        )
        vmf_recon = self.tp_vmf_decode_mu(
            params, reparameterize(k_vmf, mu_mean, mu_lnvar, training),
            model_axis,
        )
        kappa = self.tp_kappa_head(params, x, model_axis)
        kl = gaussian_kl(mu_mean, mu_lnvar) + gaussian_kl(nu_mean, nu_lnvar)

        dec = params["nb_mu_decoding"]
        nud = params["nb_nu_decoding"]
        return dict(
            z_nb=z_nb,
            z_nu=z_nu,
            depth=depth,
            wd=dec["weight"],
            bias2=dec["bias"],
            wn=nud["weight"],
            bias_n=nud["bias"] - params["nu_bias"][0],
            pb=params["mu_bias"][0],
            vmf_recon=vmf_recon,
            kappa=kappa,
            kl=kl,
        )

    def fused_step_report_tp(self, params, x, c, key, beta,
                             model_axis="model",
                             include_data_const: bool = True):
        from ..ops.nb_step import nb_step_report

        assert self._can_fuse_step(), "TP fused step needs a direct decoder"
        pre = self._tp_step_prelude(params, x, key, model_axis)
        cz, wcz = self._zero_covar(x)
        nll = nb_step_report(
            x, pre["z_nb"], cz, pre["z_nu"], pre["depth"],
            pre["wd"], wcz, pre["bias2"], pre["wn"], pre["bias_n"],
            include_const=include_data_const, pb=pre["pb"], nu_exp=True,
            model_axis=model_axis,
        )
        vmf = tp_vmf_nllik_parts(x, pre["vmf_recon"], pre["kappa"],
                                 float(self.data_dim), model_axis)
        n = x.shape[0]
        return (nll + vmf + beta * pre["kl"]) / n

    def fused_step_boot_tp(self, params, x, c, key, beta,
                           model_axis="model", need_value: bool = True):
        from ..ops.nb_step import (
            nb_step_boot_joint_tp,
            nb_step_boot_joint_tp_gradonly,
        )

        assert self._can_fuse_step(), "TP fused step needs a direct decoder"
        pre = self._tp_step_prelude(params, x, key, model_axis)
        cz, wcz = self._zero_covar(x)
        step = (nb_step_boot_joint_tp if need_value
                else nb_step_boot_joint_tp_gradonly)
        nll = step(
            model_axis, x, pre["z_nb"], cz, pre["z_nu"], pre["depth"],
            pre["wd"], wcz, pre["bias2"], pre["wn"], pre["bias_n"],
            pre["pb"],
        )
        vmf = tp_vmf_nllik_parts(x, pre["vmf_recon"], pre["kappa"],
                                 float(self.data_dim), model_axis)
        n = x.shape[0]
        return (nll + vmf + beta * pre["kl"]) / n


# ----------------------------------------------------------------------
# losses (reference: vmfnb.hh:551-599, 727-758)
# ----------------------------------------------------------------------

def vmf_nllik_parts(x: jax.Array, vmf_recon: jax.Array,
                    vmf_kappa: jax.Array, dd: float | None = None
                    ) -> jax.Array:
    """Per-sample vMF negative log-likelihood from raw pieces, summed
    (vmfnb.hh:554-574).  ``dd`` overrides the effective dimensionality
    (the mixture model restricts it to annotated features,
    vmfnb_mixture.hh:610-629)."""
    if dd is None:
        dd = float(x.shape[1])
    eps = 1e-2 / dd
    yobs = l2_normalize(jnp.log1p(jax.nn.relu(x)) + eps, axis=1)
    df = max(0.5 * dd - 1.0, 0.0)
    kappa = vmf_kappa[:, 0]  # per-sample scalar
    llik = jnp.sum(yobs * vmf_recon, axis=1) * kappa
    from ..ops.fastmath import fasterlog

    llik += df * jnp.log(kappa) - lbessel(kappa, df)
    llik -= 0.5 * dd * fasterlog(2.0 * math.pi)
    return -jnp.sum(llik)


def tp_vmf_nllik_parts(x: jax.Array, vmf_recon: jax.Array,
                       vmf_kappa: jax.Array, dd: float,
                       model_axis: str) -> jax.Array:
    """:func:`vmf_nllik_parts` with D sharded over ``model_axis``:
    ``dd`` is the GLOBAL effective dimensionality (a static), the yobs
    norm and the <yobs, recon> contraction psum over the axis, and the
    per-sample kappa terms (replicated) are added once."""
    from ..ops.fastmath import fasterlog
    from ..parallel.collectives import psum_id_grad, tp_l2_normalize

    eps = 1e-2 / dd
    yobs = tp_l2_normalize(jnp.log1p(jax.nn.relu(x)) + eps, model_axis,
                           axis=1, differentiated=False)
    df = max(0.5 * dd - 1.0, 0.0)
    kappa = vmf_kappa[:, 0]
    llik = psum_id_grad(
        jnp.sum(yobs * vmf_recon, axis=1), model_axis
    ) * kappa
    llik += df * jnp.log(kappa) - lbessel(kappa, df)
    llik -= 0.5 * dd * fasterlog(2.0 * math.pi)
    return -jnp.sum(llik)


def vmfnb_vmf_nllik(x: jax.Array, out: VMFNBVAEOutput) -> jax.Array:
    return vmf_nllik_parts(x, out.vmf_recon, out.vmf_kappa)


def vmfnb_nb_nllik(x: jax.Array, out: VMFNBVAEOutput) -> jax.Array:
    """NB negative log-likelihood (vmfnb.hh:576-599)."""
    from ..ops.losses import nb_nllik

    return nb_nllik(x, out.nb_recon_mu, out.nb_recon_nu, out.nb_recon_depth)


def vmfnb_composite_loss(x: jax.Array, out: VMFNBVAEOutput, rate) -> jax.Array:
    """(NB NLL + vMF NLL + rate * (KL_mu + KL_nu)) / n
    (reference: composite_loss_t, vmfnb.hh:727-758)."""
    n = x.shape[0]
    kl_nb = gaussian_kl(out.nb_mu_mean, out.nb_mu_lnvar) + gaussian_kl(
        out.nb_nu_mean, out.nb_nu_lnvar
    )
    return (vmfnb_nb_nllik(x, out) + vmfnb_vmf_nllik(x, out) + rate * kl_nb) / n
