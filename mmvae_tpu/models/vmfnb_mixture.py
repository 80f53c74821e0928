"""Labeled-mixture vMF + NB VAE.

TPU-native reimplementation of the reference's mixture variant
(include/models/vmfnb_mixture.hh:268-848): the vMF part is a K-component
mixture with a D x K parameter ``ln_vmf_mu`` masked by a fixed D x K
annotation matrix L; mixture responsibilities come from a closed-form
E-step ``log_softmax(<xn, mu> * kappa)`` during training and a hard
Gumbel-softmax draw at eval; the NB mu encoder mixes K per-component
linear heads weighted by the responsibilities.

TPU-first design note: the reference loops over K separate
``torch::nn::Linear`` heads (vmfnb_mixture.hh:482-500); here the K heads
are one stacked (K, H, R) tensor so the mixing is a single batched
einsum on the MXU.

Deviation (same as vmfnb.py): the reference's vMF loss broadcasts a
shape-(n,) row-sum against the (n,1) kappa head into an (n,n) matrix
(vmfnb_mixture.hh:624); we compute the per-sample quantity.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.initializers import linear_apply, torch_linear_init
from ..ops.lbessel import lbessel
from ..ops.losses import gaussian_kl, l2_normalize, uniform_kl
from .modules import apply_stack, init_linear_stack, reparameterize


class VMFNBMixtureOutput(NamedTuple):
    """Reference: vmfnb_vae_out_t of the mixture header
    (vmfnb_mixture.hh:594-605)."""

    nb_recon_mu: jax.Array
    nb_recon_nu: jax.Array
    nb_recon_depth: jax.Array
    nb_mu_mean: jax.Array
    nb_mu_lnvar: jax.Array
    nb_nu_mean: jax.Array
    nb_nu_lnvar: jax.Array
    vmf_recon: jax.Array
    vmf_logits: jax.Array
    vmf_kappa: jax.Array
    vmf_latent: jax.Array  # responsibilities / hard assignment (n x K)


class VMFOut(NamedTuple):
    """Reference: vmf_out_t (vmf_forward result)."""

    mu: jax.Array        # D x K unit columns
    logits: jax.Array    # n x K log responsibilities
    latent: jax.Array    # n x K responsibilities (soft) or one-hot (eval)
    recon: jax.Array     # n x D
    kappa: jax.Array     # n x 1


@dataclass(frozen=True)
class VMFNBMixtureVAE:
    """Static configuration.  ``label`` is the fixed D x K membership
    matrix from :class:`mmvae_tpu.data.Annotation`
    (ctor: vmfnb_mixture.hh:355-467)."""

    label: np.ndarray  # D x K, not trained
    mean_encoding: tuple[int, ...] = ()
    mean_decoding: tuple[int, ...] = ()
    mean_latent: int = 2
    overdisp_encoding: int = 1
    overdisp_latent: int = 1
    kappa_min: float = 0.1
    kappa_max: float = 100.0
    do_relu: bool = False
    nu_max: float = 1e4

    @property
    def data_dim(self) -> int:
        return int(np.asarray(self.label).shape[0])

    @property
    def n_components(self) -> int:
        return int(np.asarray(self.label).shape[1])

    def _filter(self) -> np.ndarray:
        """1 x D mask of features covered by any component
        (vmfnb_mixture.hh:460-464)."""
        L = np.asarray(self.label)
        return (L.sum(axis=1, keepdims=True).T > 0).astype(np.float32)

    @property
    def dd(self) -> float:
        """Effective dimensionality used by the vMF loss
        (vmfnb_mixture.hh:464)."""
        return float(self._filter().sum())

    def init(self, key: jax.Array) -> dict:
        D, K, R = self.data_dim, self.n_components, self.mean_latent
        keys = iter(jax.random.split(key, 16))
        params: dict = {
            "x_mean": jnp.zeros((1, D)),
            "ln_x_sd": jnp.ones((1, D)),
            "mu_bias": jnp.zeros((1, D)),
            "nu_bias": jnp.zeros((1, D)),
            "ln_vmf_mu": jnp.zeros((D, K)),
        }
        hidden = list(self.mean_encoding)
        enc_params, _, d_prev = init_linear_stack(
            next(keys), "nb_mu_encoding", D, hidden, R if not hidden else None
        )
        params.update(enc_params)

        # K per-component mean heads as one stacked tensor (MXU-friendly)
        head_keys = jax.random.split(next(keys), K)
        heads = [torch_linear_init(head_keys[k], d_prev, R) for k in range(K)]
        params["nb_mu_representation_mean_k"] = {
            "weight": jnp.stack([h["weight"] for h in heads]),  # (K, d_prev, R)
            "bias": jnp.stack([h["bias"] for h in heads]),      # (K, R)
        }
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

    # --- input normalizations (vmfnb_mixture.hh:656-678) ---------------
    def normalize_nb_x(self, params: dict, x: jax.Array) -> jax.Array:
        eps = 1e-2
        xn = l2_normalize(jnp.log1p(x), axis=1)
        return (xn - params["x_mean"]) / (
            jax.nn.softplus(params["ln_x_sd"]) + eps
        )

    def normalize_vmf_x(self, x: jax.Array) -> jax.Array:
        eps = 1e-2 / float(x.shape[1])
        filt = jnp.asarray(self._filter())
        return l2_normalize((jnp.log1p(x) + eps) * filt, axis=1)

    # --- vMF mixture (vmfnb_mixture.hh:538-560, 680-696) ---------------
    def vmf_forward(
        self, params: dict, x: jax.Array, key: jax.Array, training: bool
    ) -> VMFOut:
        L = jnp.asarray(np.asarray(self.label, dtype=np.float32))
        vmf_eps = 1e-2 / float(x.shape[1])
        # columns of (exp(ln_mu)+eps) * L, L2-normalized over features
        vmf_mu = l2_normalize((jnp.exp(params["ln_vmf_mu"]) + vmf_eps) * L, axis=0)
        from ..ops.fastmath import fasterlog

        kappa = jnp.exp(
            jnp.clip(
                linear_apply(params["ln_kappa"], x),
                fasterlog(self.kappa_min),
                fasterlog(self.kappa_max),
            )
        )
        xn = self.normalize_vmf_x(x)
        logits = jax.nn.log_softmax((xn @ vmf_mu) * kappa, axis=1)
        if training:
            latent = jnp.exp(logits)
        else:
            # hard Gumbel-softmax with straight-through estimator
            # (vmfnb_mixture.hh:692-695)
            g = -jnp.log(-jnp.log(
                jax.random.uniform(key, logits.shape, minval=1e-20, maxval=1.0)
            ))
            y_soft = jax.nn.softmax(logits + g, axis=1)
            hard = jax.nn.one_hot(
                jnp.argmax(y_soft, axis=1), logits.shape[1], dtype=y_soft.dtype
            )
            latent = jax.lax.stop_gradient(hard - y_soft) + y_soft
        filt = jnp.asarray(self._filter())
        recon = (latent @ vmf_mu.T) * filt
        return VMFOut(vmf_mu, logits, latent, recon, kappa)

    # --- NB pathway ------------------------------------------------------
    def nb_encode_mu(
        self, params: dict, x: jax.Array, z: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """Responsibility-weighted mixture of K mean heads
        (vmfnb_mixture.hh:482-500), as one batched einsum."""
        h = apply_stack(
            params, self._enc_names(), self.normalize_nb_x(params, x),
            self.do_relu, relu_last=True,
        )
        lnvar = jnp.clip(
            linear_apply(params["nb_mu_representation_logvariance"], h), -4.0, 4.0
        )
        heads = params["nb_mu_representation_mean_k"]
        # (n,H) x (K,H,R) -> (n,K,R), + (K,R), weighted by z (n,K)
        mu_k = jnp.einsum("nh,khr->nkr", h, heads["weight"]) + heads["bias"][None]
        mu = jnp.sum(mu_k * z[:, :, None], axis=1)
        return mu, lnvar

    def nb_decode_mu(self, params: dict, z: jax.Array) -> jax.Array:
        """mu_bias OUTSIDE log_softmax (vmfnb_mixture.hh:502-507)."""
        h = apply_stack(params, self._dec_names(), z, self.do_relu, relu_last=False)
        return jnp.exp(jax.nn.log_softmax(h, axis=1) + params["mu_bias"])

    def nb_encode_nu(self, params: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        h = jax.nn.relu(linear_apply(params["nb_nu_encoding"], x))
        lnvar = jnp.clip(
            linear_apply(params["nb_nu_representation_logvariance"], h), -4.0, 4.0
        )
        return linear_apply(params["nb_nu_representation_mean"], h), lnvar

    def nb_decode_nu(self, params: dict, z: jax.Array) -> jax.Array:
        ret = jnp.exp(linear_apply(params["nb_nu_decoding"], z) - params["nu_bias"])
        return jnp.clip(ret, 0.0, self.nu_max)

    def forward(
        self,
        params: dict,
        x: jax.Array,
        key: jax.Array,
        training: bool = True,
    ) -> VMFNBMixtureOutput:
        """Reference vmfnb_mixture.hh:562-605."""
        k_gumbel, k_mu, k_nu = jax.random.split(key, 3)
        vmf = self.vmf_forward(params, x, k_gumbel, training)

        mu_mean, mu_lnvar = self.nb_encode_mu(params, x, vmf.latent)
        nb_mu = self.nb_decode_mu(
            params, reparameterize(k_mu, mu_mean, mu_lnvar, training)
        )
        nu_mean, nu_lnvar = self.nb_encode_nu(params, x)
        nb_nu = self.nb_decode_nu(
            params, reparameterize(k_nu, nu_mean, nu_lnvar, training)
        )
        depth = jax.nn.softplus(linear_apply(params["depth"], x))

        return VMFNBMixtureOutput(
            nb_mu, nb_nu, depth, mu_mean, mu_lnvar, nu_mean, nu_lnvar,
            vmf.recon, vmf.logits, vmf.kappa, vmf.latent,
        )

    # ------------------------------------------------------------------
    # Fused step path: identical NB decoder structure to the joint model
    # (pb outside log_softmax, exp-nu), so it reuses the joint kernel
    # variant; the vMF mixture (E-step + masked directions) stays XLA.
    # ------------------------------------------------------------------
    def _can_fuse_step(self) -> bool:
        from ..ops.nb_elbo import NU_HI

        # the kernels bake NU_HI as the nu clamp (see vmfnb.py)
        return not self.mean_decoding and self.nu_max == NU_HI

    def _step_prelude(self, params, x, key, training=True):
        k_gumbel, k_mu, k_nu = jax.random.split(key, 3)
        vmf = self.vmf_forward(params, x, k_gumbel, training)
        mu_mean, mu_lnvar = self.nb_encode_mu(params, x, vmf.latent)
        z_mu = reparameterize(k_mu, mu_mean, mu_lnvar, training)
        nu_mean, nu_lnvar = self.nb_encode_nu(params, x)
        z_nu = reparameterize(k_nu, nu_mean, nu_lnvar, training)
        depth = jax.nn.softplus(linear_apply(params["depth"], x))
        kl = (gaussian_kl(mu_mean, mu_lnvar)
              + gaussian_kl(nu_mean, nu_lnvar)
              + uniform_kl(vmf.logits))

        dec = params["nb_mu_decoding"]
        nud = params["nb_nu_decoding"]
        return dict(
            z_mu=z_mu,
            z_nu=z_nu,
            depth=depth,
            wd=dec["weight"],
            bias2=dec["bias"],
            wn=nud["weight"],
            bias_n=nud["bias"] - params["nu_bias"][0],
            pb=params["mu_bias"][0],
            vmf=vmf,
            kl=kl,
        )

    def _zero_covar(self, x):
        # weight width follows x (= the LOCAL feature shard under TP)
        B = x.shape[0]
        return (jnp.zeros((B, 1), jnp.float32),
                jnp.zeros((1, x.shape[1]), jnp.float32))

    def fused_step_report(self, params, x, c, key, beta,
                          include_data_const: bool = True):
        from ..ops.nb_step import nb_step_report

        if not self._can_fuse_step():
            out = self.forward(params, jnp.asarray(x, jnp.float32), key,
                               True)
            return mixture_composite_loss(x, out, beta, self.dd)
        pre = self._step_prelude(params, x, key)
        cz, wcz = self._zero_covar(x)
        nll = nb_step_report(
            x, pre["z_mu"], cz, pre["z_nu"], pre["depth"],
            pre["wd"], wcz, pre["bias2"], pre["wn"], pre["bias_n"],
            include_const=include_data_const, pb=pre["pb"], nu_exp=True,
        )
        vmf_nll = _mixture_vmf_nllik_parts(
            x, pre["vmf"].recon, pre["vmf"].kappa, self.dd
        )
        n = x.shape[0]
        return (nll + vmf_nll + beta * pre["kl"]) / n

    def fused_step_boot(self, params, x, c, key, beta,
                        need_value: bool = True):
        from ..ops.nb_step import (
            nb_step_boot_joint,
            nb_step_boot_joint_gradonly,
        )

        if not self._can_fuse_step():
            out = self.forward(params, jnp.asarray(x, jnp.float32), key,
                               True)
            return mixture_composite_loss(x, out, beta, self.dd)
        pre = self._step_prelude(params, x, key)
        cz, wcz = self._zero_covar(x)
        step = (nb_step_boot_joint if need_value
                else nb_step_boot_joint_gradonly)
        nll = step(
            x, pre["z_mu"], cz, pre["z_nu"], pre["depth"],
            pre["wd"], wcz, pre["bias2"], pre["wn"], pre["bias_n"],
            pre["pb"],
        )
        vmf_nll = _mixture_vmf_nllik_parts(
            x, pre["vmf"].recon, pre["vmf"].kappa, self.dd
        )
        n = x.shape[0]
        return (nll + vmf_nll + beta * pre["kl"]) / n

    # ------------------------------------------------------------------
    # Tensor-parallel fused step (SURVEY §5.7): D sharded over 'model'.
    # The D x K ``ln_vmf_mu`` directions and the fixed label/filter
    # masks are row shards; the E-step's <xn, mu> contraction and every
    # column L2 norm psum over the axis; the responsibilities/logits
    # (n x K) stay replicated; the NB half runs the joint TP kernels.
    # This is exactly the atlas-scale-D layout TP exists for
    # (vmfnb_mixture.hh:482-560).
    # ------------------------------------------------------------------
    def tp_pspecs(self, params: dict):
        """Name-aware TP PartitionSpecs (shared rules:
        :func:`~mmvae_tpu.parallel.mesh.feature_sharded_pspecs`);
        ``ln_vmf_mu`` is a (D, K) row shard."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import feature_sharded_pspecs

        return feature_sharded_pspecs(
            params,
            row={self._enc_names()[0], "nb_nu_encoding", "depth",
                 "ln_kappa"},
            col={"nb_mu_decoding", "nb_nu_decoding"},
            flat={"x_mean", "ln_x_sd", "mu_bias", "nu_bias"},
            overrides={"ln_vmf_mu": P("model", None)},
        )

    def _tp_first_linear(self, p, xn, model_axis):
        from ..parallel.collectives import psum_id_grad

        return psum_id_grad(xn @ p["weight"], model_axis) + p["bias"]

    def _tp_local_rows(self, arr, x, model_axis):
        """Local 'model'-shard rows of a closed-over full (D, ...)
        constant: shards are contiguous row blocks of x's column
        axis."""
        i = jax.lax.axis_index(model_axis)
        d_loc = x.shape[1]
        return jax.lax.dynamic_slice_in_dim(arr, i * d_loc, d_loc, 0)

    def tp_normalize_nb_x(self, params, x, model_axis):
        from ..parallel.collectives import tp_l2_normalize

        eps = 1e-2
        xn = tp_l2_normalize(jnp.log1p(x), model_axis, axis=1,
                             differentiated=False)
        return (xn - params["x_mean"]) / (
            jax.nn.softplus(params["ln_x_sd"]) + eps
        )

    def tp_normalize_vmf_x(self, x, model_axis):
        from ..parallel.collectives import tp_l2_normalize

        eps = 1e-2 / float(self.data_dim)
        filt = self._tp_local_rows(
            jnp.asarray(self._filter().T), x, model_axis
        ).T  # (1, D_loc)
        return tp_l2_normalize((jnp.log1p(x) + eps) * filt, model_axis,
                               axis=1, differentiated=False)

    def tp_vmf_forward(self, params, x, key, training, model_axis):
        from ..ops.fastmath import fasterlog
        from ..parallel.collectives import (
            psum_grad,
            psum_id_grad,
            tp_l2_normalize,
        )

        L = self._tp_local_rows(
            jnp.asarray(np.asarray(self.label, dtype=np.float32)),
            x, model_axis,
        )
        vmf_eps = 1e-2 / float(self.data_dim)
        # columns of (exp(ln_mu)+eps) * L, L2-normalized over the GLOBAL
        # feature axis (psum'd column norms)
        vmf_mu = tp_l2_normalize(
            (jnp.exp(params["ln_vmf_mu"]) + vmf_eps) * L, model_axis,
            axis=0,
        )
        kappa = jnp.exp(
            jnp.clip(
                self._tp_first_linear(params["ln_kappa"], x, model_axis),
                fasterlog(self.kappa_min),
                fasterlog(self.kappa_max),
            )
        )
        xn = self.tp_normalize_vmf_x(x, model_axis)
        logits = jax.nn.log_softmax(
            psum_id_grad(xn @ vmf_mu, model_axis) * kappa, axis=1
        )
        if training:
            latent = jnp.exp(logits)
        else:
            # logits and key are replicated over 'model': every shard
            # draws the same Gumbel noise and hard assignment
            g = -jnp.log(-jnp.log(
                jax.random.uniform(key, logits.shape, minval=1e-20,
                                   maxval=1.0)
            ))
            y_soft = jax.nn.softmax(logits + g, axis=1)
            hard = jax.nn.one_hot(
                jnp.argmax(y_soft, axis=1), logits.shape[1],
                dtype=y_soft.dtype,
            )
            latent = jax.lax.stop_gradient(hard - y_soft) + y_soft
        filt = self._tp_local_rows(
            jnp.asarray(self._filter().T), x, model_axis
        ).T
        # replicated -> row-sharded boundary for THIS use of the
        # responsibilities only (their other consumers are replicated):
        # the recon branch's per-shard latent cotangents are partial
        recon = (psum_grad(latent, model_axis) @ vmf_mu.T) * filt
        return VMFOut(vmf_mu, logits, latent, recon, kappa)

    def tp_nb_encode_mu(self, params, x, z, model_axis):
        h = self._tp_first_linear(
            params[self._enc_names()[0]],
            self.tp_normalize_nb_x(params, x, model_axis), model_axis,
        )
        if self.do_relu:
            h = jax.nn.relu(h)
        for name in self._enc_names()[1:]:
            h = linear_apply(params[name], h)
            if self.do_relu:
                h = jax.nn.relu(h)
        lnvar = jnp.clip(
            linear_apply(params["nb_mu_representation_logvariance"], h),
            -4.0, 4.0,
        )
        heads = params["nb_mu_representation_mean_k"]
        mu_k = jnp.einsum("nh,khr->nkr", h, heads["weight"]) + heads["bias"][None]
        mu = jnp.sum(mu_k * z[:, :, None], axis=1)
        return mu, lnvar

    def tp_nb_encode_nu(self, params, x, model_axis):
        h = jax.nn.relu(
            self._tp_first_linear(params["nb_nu_encoding"], x, model_axis)
        )
        lnvar = jnp.clip(
            linear_apply(params["nb_nu_representation_logvariance"], h),
            -4.0, 4.0,
        )
        return linear_apply(params["nb_nu_representation_mean"], h), lnvar

    def _tp_step_prelude(self, params, x, key, model_axis, training=True):
        k_gumbel, k_mu, k_nu = jax.random.split(key, 3)
        vmf = self.tp_vmf_forward(params, x, k_gumbel, training, model_axis)
        mu_mean, mu_lnvar = self.tp_nb_encode_mu(params, x, vmf.latent,
                                                 model_axis)
        z_mu = reparameterize(k_mu, mu_mean, mu_lnvar, training)
        nu_mean, nu_lnvar = self.tp_nb_encode_nu(params, x, model_axis)
        z_nu = reparameterize(k_nu, nu_mean, nu_lnvar, training)
        depth = jax.nn.softplus(
            self._tp_first_linear(params["depth"], x, model_axis)
        )
        kl = (gaussian_kl(mu_mean, mu_lnvar)
              + gaussian_kl(nu_mean, nu_lnvar)
              + uniform_kl(vmf.logits))

        dec = params["nb_mu_decoding"]
        nud = params["nb_nu_decoding"]
        return dict(
            z_mu=z_mu,
            z_nu=z_nu,
            depth=depth,
            wd=dec["weight"],
            bias2=dec["bias"],
            wn=nud["weight"],
            bias_n=nud["bias"] - params["nu_bias"][0],
            pb=params["mu_bias"][0],
            vmf=vmf,
            kl=kl,
        )

    def fused_step_report_tp(self, params, x, c, key, beta,
                             model_axis="model",
                             include_data_const: bool = True):
        from ..ops.nb_step import nb_step_report
        from .vmfnb import tp_vmf_nllik_parts

        assert self._can_fuse_step(), "TP fused step needs a direct decoder"
        pre = self._tp_step_prelude(params, x, key, model_axis)
        cz, wcz = self._zero_covar(x)
        nll = nb_step_report(
            x, pre["z_mu"], cz, pre["z_nu"], pre["depth"],
            pre["wd"], wcz, pre["bias2"], pre["wn"], pre["bias_n"],
            include_const=include_data_const, pb=pre["pb"], nu_exp=True,
            model_axis=model_axis,
        )
        vmf_nll = tp_vmf_nllik_parts(
            x, pre["vmf"].recon, pre["vmf"].kappa, self.dd, model_axis
        )
        n = x.shape[0]
        return (nll + vmf_nll + beta * pre["kl"]) / n

    def fused_step_boot_tp(self, params, x, c, key, beta,
                           model_axis="model", need_value: bool = True):
        from ..ops.nb_step import (
            nb_step_boot_joint_tp,
            nb_step_boot_joint_tp_gradonly,
        )
        from .vmfnb import tp_vmf_nllik_parts

        assert self._can_fuse_step(), "TP fused step needs a direct decoder"
        pre = self._tp_step_prelude(params, x, key, model_axis)
        cz, wcz = self._zero_covar(x)
        step = (nb_step_boot_joint_tp if need_value
                else nb_step_boot_joint_tp_gradonly)
        nll = step(
            model_axis, x, pre["z_mu"], cz, pre["z_nu"], pre["depth"],
            pre["wd"], wcz, pre["bias2"], pre["wn"], pre["bias_n"],
            pre["pb"],
        )
        vmf_nll = tp_vmf_nllik_parts(
            x, pre["vmf"].recon, pre["vmf"].kappa, self.dd, model_axis
        )
        n = x.shape[0]
        return (nll + vmf_nll + beta * pre["kl"]) / n


# ----------------------------------------------------------------------
# losses (reference: vmfnb_mixture.hh:607-654, 812-848)
# ----------------------------------------------------------------------

def _mixture_vmf_nllik_parts(
    x: jax.Array, recon: jax.Array, kappa2d: jax.Array, dd: float
) -> jax.Array:
    """vMF NLL over the masked feature set (vmfnb_mixture.hh:610-629):
    the joint-model formula restricted to ``dd`` effective features."""
    from .vmfnb import vmf_nllik_parts

    return vmf_nllik_parts(x, recon, kappa2d, dd=dd)


def mixture_vmf_nllik(
    x: jax.Array, out: VMFNBMixtureOutput, dd: float
) -> jax.Array:
    return _mixture_vmf_nllik_parts(x, out.vmf_recon, out.vmf_kappa, dd)


def mixture_composite_loss(
    x: jax.Array, out: VMFNBMixtureOutput, rate, dd: float
) -> jax.Array:
    """(NB NLL + vMF NLL + rate*(KL_gauss + KL_uniform)) / n
    (reference: composite_loss_t, vmfnb_mixture.hh:812-848; note the
    mixture variant does NOT floor the rate at min_rate)."""
    from ..ops.losses import nb_nllik

    n = x.shape[0]
    kl_nb = gaussian_kl(out.nb_mu_mean, out.nb_mu_lnvar) + gaussian_kl(
        out.nb_nu_mean, out.nb_nu_lnvar
    )
    kl_vmf = uniform_kl(out.vmf_logits)
    nb = nb_nllik(x, out.nb_recon_mu, out.nb_recon_nu, out.nb_recon_depth)
    return (nb + mixture_vmf_nllik(x, out, dd) + rate * (kl_nb + kl_vmf)) / n
