"""v3 packed fast step for the joint vMF+NB model.

Applies the NB fast path's recipe (ops/nb_fast.py) to
:class:`~mmvae_tpu.models.vmfnb.VMFNBVAE` (reference
include/models/vmfnb.hh:241-758), whose generic step spends most of its
time in XLA glue around the joint Pallas kernels:

- **Fused in-register data views.**  Every (B, D) direction the model
  consumes — the L2-normalized log1p counts (``normalize_nb_x`` core,
  vmfnb.hh:601-611), the raw counts for the nu/depth/kappa heads, and
  the vMF observation direction ``yobs`` (vmfnb.hh:554-560) — is a
  row-scaling of ``log1p(x)`` or ``float(x)``, so all the per-forward
  contractions plus the row-norm stats behind the scalings ride ONE
  fused count-encoder kernel call (ops/enc_kernel.py) that builds both
  views in-register from the narrow int counts; nothing (B, D) is ever
  materialized.  Bootstrap resampling gathers only the int count rows
  and re-encodes them (row-wise transforms commute with row gathers
  bitwise; see ops/nb_fast.py on why re-encoding beats gathering
  outputs).
- **Gram-collapsed vMF decoder.**  The generic path materializes the
  (B, D) vMF reconstruction and L2-normalizes it only to contract it
  against ``yobs`` (vmfnb.hh:469-475, 563-566).  With a direct decoder
  ``v = z @ W + b``:  ``<yobs, v>`` collapses to one slim MXU pass
  ``yobs @ [W; b]^T`` and ``|v|^2 = z G z^T + 2 z (W b) + b.b`` with
  ``G`` from the tiny (R+1, R+1) Gram of the decoder rows — so neither
  the reconstruction, its normalizer, nor their backward ever touch a
  (B, D) tensor.
- **Packed parameters** (one (K, D) matrix + one small vector, 2-leaf
  optax chain) and **pre-drawn randomness** exactly as in nb_fast.py;
  the PRNG schedule mirrors the generic path (key -> 3-way split for
  the nb/nu/vmf reparameterizations, vmfnb.hh:519,527,533) so the two
  paths draw bitwise-identical noise.

The NB likelihood stays in the joint single-pass kernels
(ops/nb_step.py: pb outside softmax, exp-nu).  Valid for the direct
architecture (no hidden encoder/decoder layers) with the default nu
clamp; callers must check :meth:`VMFNBFastStep.supports`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .enc_kernel import count_encode
from .fastmath import fasterlog
from .lbessel import lbessel
from .losses import gaussian_kl, l2_normalize, uniform_kl
from .nb_fast import (
    PackedFastStep,
    _make_packed_optimizer,
    _softplus,
)
from .nb_step import (
    nb_step_boot_joint_gradonly,
    nb_step_report,
)


@dataclass(frozen=True)
class _JRows:
    """Row indices of the packed (K, D) joint parameter matrix."""

    R: int
    H: int
    Rn: int

    @property
    def mu_dec_w(self):  # (R, D)
        return slice(0, self.R)

    @property
    def mu_dec_b(self):
        return self.R

    @property
    def mu_bias(self):
        return self.R + 1

    @property
    def nu_dec_w(self):  # (Rn, D)
        return slice(self.R + 2, self.R + 2 + self.Rn)

    @property
    def nu_dec_b(self):
        return self.R + 2 + self.Rn

    @property
    def nu_bias(self):
        return self.R + 3 + self.Rn

    @property
    def x_mean(self):
        return self.R + 4 + self.Rn

    @property
    def ln_x_sd(self):
        return self.R + 5 + self.Rn

    @property
    def mu_enc_w(self):  # (R, D) — transposed storage
        a = self.R + 6 + self.Rn
        return slice(a, a + self.R)

    @property
    def nu_enc_w(self):  # (H, D) — transposed storage
        a = 2 * self.R + 6 + self.Rn
        return slice(a, a + self.H)

    @property
    def depth_w(self):  # (1, D) — transposed storage
        return 2 * self.R + 6 + self.Rn + self.H

    @property
    def kappa_w(self):  # (1, D) — transposed storage
        return 2 * self.R + 7 + self.Rn + self.H

    @property
    def ndk_rows(self):  # (H+2, D): nu encoder, depth, ln_kappa rows —
        # adjacent so the three raw-count heads share ONE MXU pass
        a = 2 * self.R + 6 + self.Rn
        return slice(a, a + self.H + 2)

    @property
    def vmf_rows(self):  # (R+1, D): vMF decoder weight rows + bias row —
        # adjacent so <yobs, v> and the Gram are single stacked ops
        a = 2 * self.R + 8 + self.Rn + self.H
        return slice(a, a + self.R + 1)

    @property
    def K(self):
        return 3 * self.R + 9 + self.Rn + self.H


class VMFNBFastStep(PackedFastStep):
    """Packed fast step for :class:`~mmvae_tpu.models.vmfnb.VMFNBVAE`."""


    def __init__(self, model, opt, kl=(1.0, 1e-2, 0.1)):
        assert self.supports(model), (
            "VMFNBFastStep requires the direct joint architecture "
            "with the default nu clamp"
        )
        self.model = model
        self.opt = opt
        self.kl_max, self.kl_min, self.kl_discount = kl
        self.rows = _JRows(
            R=model.mean_latent,
            H=model.overdisp_encoding,
            Rn=model.overdisp_latent,
        )
        self._sv_segs, self._sv_len = self._build_sv_layout()
        self.optimizer = _make_packed_optimizer(opt)

    @staticmethod
    def supports(model) -> bool:
        from ..models.vmfnb import VMFNBVAE

        return (
            isinstance(model, VMFNBVAE)
            and not model.mean_encoding
            and not model.mean_decoding
            and not model.vmf_decoding
            and model._can_fuse_step()
        )

    # ------------------------------------------------------------------
    # layout
    # ------------------------------------------------------------------
    def _build_sv_layout(self):
        R, H, Rn = self.rows.R, self.rows.H, self.rows.Rn
        return self._seg_layout([
            ("nb_mu_encoding.bias", (R,)),
            ("nb_mu_representation_mean.weight", (R, R)),
            ("nb_mu_representation_mean.bias", (R,)),
            ("nb_mu_representation_logvariance.weight", (R, R)),
            ("nb_mu_representation_logvariance.bias", (R,)),
            ("nb_nu_encoding.bias", (H,)),
            ("nb_nu_representation_mean.weight", (H, Rn)),
            ("nb_nu_representation_mean.bias", (Rn,)),
            ("nb_nu_representation_logvariance.weight", (H, Rn)),
            ("nb_nu_representation_logvariance.bias", (Rn,)),
            ("depth.bias", (1,)),
            ("ln_kappa.bias", (1,)),
        ])

    def pack(self, t: dict) -> dict:
        r = self.rows
        rows = [
            t["nb_mu_decoding"]["weight"],          # (R, D)
            t["nb_mu_decoding"]["bias"][None, :],
            t["mu_bias"],                            # (1, D)
            t["nb_nu_decoding"]["weight"],          # (Rn, D)
            t["nb_nu_decoding"]["bias"][None, :],
            t["nu_bias"],
            t["x_mean"],
            t["ln_x_sd"],
            t["nb_mu_encoding"]["weight"].T,        # (R, D)
            t["nb_nu_encoding"]["weight"].T,        # (H, D)
            t["depth"]["weight"].T,                  # (1, D)
            t["ln_kappa"]["weight"].T,               # (1, D)
            t["vmf_mu_decoding"]["weight"],          # (R, D)
            t["vmf_mu_decoding"]["bias"][None, :],
        ]
        P = jnp.concatenate(rows, axis=0)
        assert P.shape[0] == r.K
        sv_parts = []
        for name in self._sv_segs:
            top, leaf = name.split(".")
            sv_parts.append(jnp.ravel(t[top][leaf]))
        sv = jnp.concatenate(sv_parts)
        return {"P": P, "sv": sv}

    def unpack(self, q: dict) -> dict:
        P, sv = q["P"], q["sv"]
        r = self.rows
        out = {
            "x_mean": P[r.x_mean][None, :],
            "ln_x_sd": P[r.ln_x_sd][None, :],
            "mu_bias": P[r.mu_bias][None, :],
            "nu_bias": P[r.nu_bias][None, :],
            "nb_mu_decoding": {
                "weight": P[r.mu_dec_w],
                "bias": P[r.mu_dec_b],
            },
            "nb_nu_decoding": {
                "weight": P[r.nu_dec_w],
                "bias": P[r.nu_dec_b],
            },
            "vmf_mu_decoding": {
                "weight": P[r.vmf_rows][:-1],
                "bias": P[r.vmf_rows][-1],
            },
            "nb_mu_encoding": {"weight": P[r.mu_enc_w].T},
            "nb_nu_encoding": {"weight": P[r.nu_enc_w].T},
            "depth": {"weight": P[r.depth_w][:, None]},
            "ln_kappa": {"weight": P[r.kappa_w][:, None]},
        }
        for name, (off, shape) in self._sv_segs.items():
            top, leaf = name.split(".")
            out.setdefault(top, {})[leaf] = jnp.reshape(
                sv[off:off + math.prod(shape)], shape
            )
        return out

    # ------------------------------------------------------------------
    # compute
    # ------------------------------------------------------------------
    @staticmethod
    def _views(x):
        # the fused count_encode op (ops/enc_kernel.py) builds the
        # log1p/raw views in-register per contraction AND emits the
        # row-norm stats the vMF normalizers need — nothing to hoist
        return None

    def _heads(self, q, h_core, ndk):
        """Shared mu encoder + the three raw-count heads; semantics ==
        VMFNBVAE.shared_encode_mu / nb_encode_nu / depth / kappa_head
        (vmfnb.hh:449-460, 477-486, 498, 535-538) via hoisted algebra.
        ``h_core`` is the standardized encoder contraction and ``ndk``
        the raw-count head contraction, both computed in :meth:`_loss`
        (one fused count_encode pass)."""
        sv = q["sv"]
        H = self.rows.H
        h = h_core + self._sv(sv, "nb_mu_encoding.bias")
        if self.model.do_relu:
            h = jax.nn.relu(h)  # encoder stack ReLUs its last layer
        mu_mean = (
            h @ self._sv(sv, "nb_mu_representation_mean.weight")
            + self._sv(sv, "nb_mu_representation_mean.bias")
        )
        mu_lnvar = jnp.clip(
            h @ self._sv(sv, "nb_mu_representation_logvariance.weight")
            + self._sv(sv, "nb_mu_representation_logvariance.bias"),
            -4.0, 4.0,
        )
        # nu hidden layer is ALWAYS ReLU'd in the joint model
        # (vmfnb.hh:481 — unlike nb.hh)
        nu_h = jax.nn.relu(ndk[:, :H] + self._sv(sv, "nb_nu_encoding.bias"))
        nu_mean = (
            nu_h @ self._sv(sv, "nb_nu_representation_mean.weight")
            + self._sv(sv, "nb_nu_representation_mean.bias")
        )
        nu_lnvar = jnp.clip(
            nu_h @ self._sv(sv, "nb_nu_representation_logvariance.weight")
            + self._sv(sv, "nb_nu_representation_logvariance.bias"),
            -4.0, 4.0,
        )
        depth = _softplus(ndk[:, H:H + 1] + self._sv(sv, "depth.bias"))
        ln_kappa = ndk[:, H + 1:H + 2] + self._sv(sv, "ln_kappa.bias")
        kappa = jnp.exp(jnp.clip(
            ln_kappa,
            fasterlog(self.model.kappa_min),
            fasterlog(self.model.kappa_max),
        ))
        return mu_mean, mu_lnvar, nu_mean, nu_lnvar, depth, kappa

    def _vmf_nll(self, q, t, z_vmf, kappa):
        """vMF negative log-likelihood without the (B, D)
        reconstruction: ``t = yobs @ [W; b]^T`` comes precontracted
        from the shared stacked dot in :meth:`_loss`; ``|v|`` comes
        from the tiny (R+1, R+1) decoder Gram (vmfnb.hh:554-574; same
        values as vmf_nllik_parts up to norm-reduction order)."""
        P = q["P"]
        r = self.rows
        vrows = P[r.vmf_rows]                               # (R+1, D)
        dot = jnp.sum(t[:, :-1] * z_vmf, axis=1) + t[:, -1]
        # the Gram feeds |v| (a normalizer): keep true-f32 products —
        # the generic path computes |v| from f32 elementwise squares,
        # and DEFAULT bf16 rounding here would be a 1e-3-level bias on
        # every llik term.  (R+1)^2 x D is tiny; cost is negligible.
        gram = jnp.dot(vrows, vrows.T,
                       precision=jax.lax.Precision.HIGHEST)
        G, gb, bb = gram[:-1, :-1], gram[:-1, -1], gram[-1, -1]
        sq = (jnp.sum((z_vmf @ G) * z_vmf, axis=1)
              + 2.0 * (z_vmf @ gb) + bb)
        # |v| >= |b_v| > 0 in practice; the max mirrors l2_normalize's
        # eps guard (ops/losses.py) and protects the sqrt grad at 0
        norm = jnp.maximum(jnp.sqrt(jnp.maximum(sq, 0.0)), 1e-12)
        dd = float(self.model.data_dim)
        df = max(0.5 * dd - 1.0, 0.0)
        k = kappa[:, 0]
        llik = (dot / norm) * k
        llik += df * jnp.log(k) - lbessel(k, df)
        llik -= 0.5 * dd * fasterlog(2.0 * math.pi)
        return -jnp.sum(llik)

    # ------------------------------------------------------------------
    # randomness: mirrors the generic path exactly — split(key) ->
    # (rep, boot); 3-way split for (nb, nu, vmf) reparameterizations
    # (vmfnb.hh:519,527,533 via models/vmfnb._step_prelude)
    # ------------------------------------------------------------------
    def _draw_batch(self, key, B: int):
        R, Rn = self.rows.R, self.rows.Rn
        k_rep, k_boot = jax.random.split(key)

        def draws(k):
            k_nb, k_nu, k_vmf = jax.random.split(k, 3)
            return (jax.random.normal(k_nb, (B, R)),
                    jax.random.normal(k_nu, (B, Rn)),
                    jax.random.normal(k_vmf, (B, R)))

        rep_eps = draws(k_rep)

        def boot(i):
            kb = jax.random.fold_in(k_boot, i)
            k_idx, k_fwd = jax.random.split(kb)
            ridx = jax.random.randint(k_idx, (B,), 0, B)
            return (ridx,) + draws(k_fwd)

        ridx, b_nb, b_nu, b_vmf = jax.vmap(boot)(
            jnp.arange(self.opt.nboot, dtype=jnp.uint32)
        )
        return dict(rep_eps=rep_eps, ridx=ridx,
                    boot_eps=(b_nb, b_nu, b_vmf))

    # ------------------------------------------------------------------
    def _loss(self, q, views, x, c, ridx, eps, beta, include_const,
              boot: bool):
        del views, c  # no hoisted views; no covariate pathway
        if ridx is not None:
            # resample the INPUT rows and re-encode them: the per-row
            # transforms and stats commute with row gathers bitwise,
            # and only the narrow int counts are gathered (see nb_fast)
            x = jnp.take(x, ridx, axis=0)
        P = q["P"]
        r = self.rows
        R = r.R
        # ONE fused pass over the counts (ops/enc_kernel.py) serves the
        # standardized mu encoder (xn_core = L * inv_nL), the vMF
        # observation dot (yobs = (L + eps) * inv_nY), the three
        # raw-count heads AND the row-norm stats: contract log1p(x)
        # against [mu_enc/sd ; vmf decoder rows] and float(x) against
        # the nu/depth/kappa rows, building both views in-register —
        # the row scalings apply to the slim outputs, and
        # d<yobs, v>/dv_d = (L_d + eps) * inv_nY is reproduced exactly
        # by the eps * rowsum(vrows) correction.  Identities:
        # |L + eps|^2 = |L|^2 + 2 eps sum(L) + D eps^2 (vmfnb.hh:554-560,
        # 601-611; counts are non-negative so relu(x) == x).
        sd = _softplus(P[r.ln_x_sd]) + 1e-2                 # (D,)
        Wt = P[r.mu_enc_w] / sd                             # (R, D)
        vrows = P[r.vmf_rows]                               # (R+1, D)
        out, ndk, stats = count_encode(
            x, (Wt, vrows), P[r.ndk_rows], None, True,
        )
        s, ssq = stats[:, 0], stats[:, 1]
        D = float(self.model.data_dim)
        eps_y = 1e-2 / D
        inv_nL = 1.0 / jnp.maximum(jnp.sqrt(ssq), 1e-12)
        ny = jnp.sqrt(ssq + 2.0 * eps_y * s + D * eps_y * eps_y)
        inv_nY = 1.0 / jnp.maximum(ny, 1e-12)
        h_core = out[:, :R] * inv_nL[:, None] - P[r.x_mean] @ Wt.T
        t = (out[:, R:] + eps_y * jnp.sum(vrows, axis=1)) * inv_nY[:, None]
        heads = self._heads(q, h_core, ndk)
        mu_mean, mu_lnvar, nu_mean, nu_lnvar, depth, kappa = heads
        z_nb = self._reparam(eps[0], mu_mean, mu_lnvar)
        z_nu = self._reparam(eps[1], nu_mean, nu_lnvar)
        z_vmf = self._reparam(eps[2], mu_mean, mu_lnvar)
        kl = gaussian_kl(mu_mean, mu_lnvar) + gaussian_kl(nu_mean, nu_lnvar)

        wd = P[r.mu_dec_w]
        bias2 = P[r.mu_dec_b]
        wn = P[r.nu_dec_w]
        bias_n = P[r.nu_dec_b] - P[r.nu_bias]
        pb = P[r.mu_bias]
        B = x.shape[0]
        cz = jnp.zeros((B, 1), jnp.float32)
        wcz = jnp.zeros((1, x.shape[1]), jnp.float32)
        if boot:
            nll = nb_step_boot_joint_gradonly(
                x, z_nb, cz, z_nu, depth, wd, wcz, bias2, wn, bias_n, pb
            )
        else:
            nll = nb_step_report(
                x, z_nb, cz, z_nu, depth, wd, wcz, bias2, wn, bias_n,
                include_const=include_const, pb=pb, nu_exp=True,
            )
        vmf = self._vmf_nll(q, t, z_vmf, kappa)
        return (nll + vmf + beta * kl) / B


@dataclass(frozen=True)
class _MRows:
    """Row indices of the packed (Krows, D) mixture parameter matrix."""

    R: int
    H: int
    Rn: int
    K: int  # mixture components

    @property
    def mu_dec_w(self):
        return slice(0, self.R)

    @property
    def mu_dec_b(self):
        return self.R

    @property
    def mu_bias(self):
        return self.R + 1

    @property
    def nu_dec_w(self):
        return slice(self.R + 2, self.R + 2 + self.Rn)

    @property
    def nu_dec_b(self):
        return self.R + 2 + self.Rn

    @property
    def nu_bias(self):
        return self.R + 3 + self.Rn

    @property
    def x_mean(self):
        return self.R + 4 + self.Rn

    @property
    def ln_x_sd(self):
        return self.R + 5 + self.Rn

    @property
    def mu_enc_w(self):  # (R, D) — transposed storage
        a = self.R + 6 + self.Rn
        return slice(a, a + self.R)

    @property
    def ndk_rows(self):  # (H+2, D): nu encoder, depth, ln_kappa rows
        a = 2 * self.R + 6 + self.Rn
        return slice(a, a + self.H + 2)

    @property
    def nu_enc_w(self):
        a = 2 * self.R + 6 + self.Rn
        return slice(a, a + self.H)

    @property
    def depth_w(self):
        return 2 * self.R + 6 + self.Rn + self.H

    @property
    def kappa_w(self):
        return 2 * self.R + 7 + self.Rn + self.H

    @property
    def vmf_mu_rows(self):  # (K, D) — ln_vmf_mu transposed storage
        a = 2 * self.R + 8 + self.Rn + self.H
        return slice(a, a + self.K)

    @property
    def Krows(self):
        return 2 * self.R + 8 + self.Rn + self.H + self.K


class VMFNBMixtureFastStep(PackedFastStep):
    """Packed fast step for
    :class:`~mmvae_tpu.models.vmfnb_mixture.VMFNBMixtureVAE`.

    Same recipe as :class:`VMFNBFastStep`, plus the mixture-specific
    collapses (reference vmfnb_mixture.hh:482-560, 607-654):

    - the E-step input ``xn_vmf`` and the masked observation direction
      ``yobs * filter`` are parameter-independent hoisted views;
    - the masked mixture directions live as K packed rows, so the
      E-step contraction and the loss contraction are two slim MXU
      passes over the batch;
    - the (B, D) mixture reconstruction is never materialized: the
      loss needs only ``<yobs*filt, recon>``, which equals
      ``sum(latent * (yobs_f @ mu^T), axis=1)`` because the recon is a
      responsibility mix of the (already unit) masked directions.
    """


    def __init__(self, model, opt, kl=(1.0, 1e-2, 0.1)):
        assert self.supports(model), (
            "VMFNBMixtureFastStep requires the direct mixture "
            "architecture with the default nu clamp"
        )
        self.model = model
        self.opt = opt
        self.kl_max, self.kl_min, self.kl_discount = kl
        self.rows = _MRows(
            R=model.mean_latent,
            H=model.overdisp_encoding,
            Rn=model.overdisp_latent,
            K=model.n_components,
        )
        self._label = jnp.asarray(
            np.asarray(model.label, dtype=np.float32).T)   # (K, D)
        self._filt = jnp.asarray(model._filter())           # (1, D)
        self._sv_segs, self._sv_len = self._build_sv_layout()
        self.optimizer = _make_packed_optimizer(opt)

    @staticmethod
    def supports(model) -> bool:
        from ..models.vmfnb_mixture import VMFNBMixtureVAE

        return (
            isinstance(model, VMFNBMixtureVAE)
            and not model.mean_encoding
            and not model.mean_decoding
            and model._can_fuse_step()
        )

    def _build_sv_layout(self):
        R, H, Rn, K = (self.rows.R, self.rows.H, self.rows.Rn,
                       self.rows.K)
        return self._seg_layout([
            ("nb_mu_encoding.bias", (R,)),
            ("nb_mu_representation_mean_k.weight", (K, R, R)),
            ("nb_mu_representation_mean_k.bias", (K, R)),
            ("nb_mu_representation_logvariance.weight", (R, R)),
            ("nb_mu_representation_logvariance.bias", (R,)),
            ("nb_nu_encoding.bias", (H,)),
            ("nb_nu_representation_mean.weight", (H, Rn)),
            ("nb_nu_representation_mean.bias", (Rn,)),
            ("nb_nu_representation_logvariance.weight", (H, Rn)),
            ("nb_nu_representation_logvariance.bias", (Rn,)),
            ("depth.bias", (1,)),
            ("ln_kappa.bias", (1,)),
        ])

    def pack(self, t: dict) -> dict:
        r = self.rows
        rows = [
            t["nb_mu_decoding"]["weight"],
            t["nb_mu_decoding"]["bias"][None, :],
            t["mu_bias"],
            t["nb_nu_decoding"]["weight"],
            t["nb_nu_decoding"]["bias"][None, :],
            t["nu_bias"],
            t["x_mean"],
            t["ln_x_sd"],
            t["nb_mu_encoding"]["weight"].T,
            t["nb_nu_encoding"]["weight"].T,
            t["depth"]["weight"].T,
            t["ln_kappa"]["weight"].T,
            t["ln_vmf_mu"].T,                                # (K, D)
        ]
        P = jnp.concatenate(rows, axis=0)
        assert P.shape[0] == r.Krows
        sv_parts = []
        for name in self._sv_segs:
            top, leaf = name.split(".")
            sv_parts.append(jnp.ravel(t[top][leaf]))
        sv = jnp.concatenate(sv_parts)
        return {"P": P, "sv": sv}

    def unpack(self, q: dict) -> dict:
        P, sv = q["P"], q["sv"]
        r = self.rows
        out = {
            "x_mean": P[r.x_mean][None, :],
            "ln_x_sd": P[r.ln_x_sd][None, :],
            "mu_bias": P[r.mu_bias][None, :],
            "nu_bias": P[r.nu_bias][None, :],
            "ln_vmf_mu": P[r.vmf_mu_rows].T,
            "nb_mu_decoding": {
                "weight": P[r.mu_dec_w],
                "bias": P[r.mu_dec_b],
            },
            "nb_nu_decoding": {
                "weight": P[r.nu_dec_w],
                "bias": P[r.nu_dec_b],
            },
            "nb_mu_encoding": {"weight": P[r.mu_enc_w].T},
            "nb_nu_encoding": {"weight": P[r.nu_enc_w].T},
            "depth": {"weight": P[r.depth_w][:, None]},
            "ln_kappa": {"weight": P[r.kappa_w][:, None]},
        }
        for name, (off, shape) in self._sv_segs.items():
            top, leaf = name.split(".")
            out.setdefault(top, {})[leaf] = jnp.reshape(
                sv[off:off + math.prod(shape)], shape
            )
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def _views(x):
        # the fused count_encode op (ops/enc_kernel.py) builds the
        # log1p/raw views in-register per contraction AND emits the
        # plain + filtered row-norm stats the mixture's three
        # normalizers need — nothing to hoist
        return None

    def _draw_batch(self, key, B: int):
        """split(key, 3) -> (gumbel, mu, nu); the Gumbel key is unused
        in training mode (responsibilities are the soft E-step,
        vmfnb_mixture.hh:688-691) but the split order must mirror the
        generic path so the mu/nu draws are bitwise identical."""
        R, Rn = self.rows.R, self.rows.Rn
        k_rep, k_boot = jax.random.split(key)

        def draws(k):
            _, k_mu, k_nu = jax.random.split(k, 3)
            return (jax.random.normal(k_mu, (B, R)),
                    jax.random.normal(k_nu, (B, Rn)))

        rep_eps = draws(k_rep)

        def boot(i):
            kb = jax.random.fold_in(k_boot, i)
            k_idx, k_fwd = jax.random.split(kb)
            ridx = jax.random.randint(k_idx, (B,), 0, B)
            return (ridx,) + draws(k_fwd)

        ridx, b_mu, b_nu = jax.vmap(boot)(
            jnp.arange(self.opt.nboot, dtype=jnp.uint32)
        )
        return dict(rep_eps=rep_eps, ridx=ridx, boot_eps=(b_mu, b_nu))

    # ------------------------------------------------------------------
    def _loss(self, q, views, x, c, ridx, eps, beta, include_const,
              boot: bool):
        del views, c  # no hoisted views; no covariate pathway
        if ridx is not None:
            # gather the narrow int counts only and re-encode: per-row
            # transforms and stats commute with row gathers bitwise
            x = jnp.take(x, ridx, axis=0)
        P = q["P"]
        r = self.rows
        H = r.H
        sv = q["sv"]

        # normalized masked component directions
        # (vmfnb_mixture.hh:538-560): rows are ln_vmf_mu^T, each
        # component's direction normalized over features; zero outside
        # its label mask, hence zero outside the filter
        eps_mu = 1e-2 / float(self.model.data_dim)
        vmu = l2_normalize(
            (jnp.exp(P[r.vmf_mu_rows]) + eps_mu) * self._label, axis=1
        )                                                   # (K, D)
        fsum = jnp.sum(vmu, axis=1)                         # (K,)
        sd = _softplus(P[r.ln_x_sd]) + 1e-2
        Wt = P[r.mu_enc_w] / sd
        # ONE fused pass over the counts (ops/enc_kernel.py) serves the
        # standardized mu encoder, the E-step contraction, the loss
        # contraction, the nu/depth/kappa raw-count heads AND the
        # plain + filtered row-norm stats: both vMF dots are
        # row-scalings of the same core product L @ vmu^T (vmu * filt
        # == vmu), with eps * rowsum(vmu) corrections.  Identities
        # (vmfnb_mixture.hh:562-576, 673-678):
        # |(L+eps)filt|^2 = sum(filt L^2) + 2 eps sum(filt L) + eps^2 dd
        # |L+eps'|^2    = |L|^2 + 2 eps' sum(L) + D eps'^2
        out, ndk, stats = count_encode(
            x, (Wt, vmu), P[r.ndk_rows], self._filt, True,
        )
        s, ssq, s_f, ssq_f = (stats[:, 0], stats[:, 1], stats[:, 2],
                              stats[:, 3])
        D = float(self.model.data_dim)
        dd = float(self.model.dd)
        eps_f = 1e-2 / D
        eps_y = 1e-2 / dd
        inv_nL = 1.0 / jnp.maximum(jnp.sqrt(ssq), 1e-12)
        nv = jnp.sqrt(ssq_f + 2.0 * eps_f * s_f + eps_f * eps_f * dd)
        inv_nV = 1.0 / jnp.maximum(nv, 1e-12)
        ny = jnp.sqrt(ssq + 2.0 * eps_y * s + D * eps_y * eps_y)
        inv_nY = 1.0 / jnp.maximum(ny, 1e-12)
        ln_kappa = ndk[:, H + 1:H + 2] + self._sv(sv, "ln_kappa.bias")
        kappa = jnp.exp(jnp.clip(
            ln_kappa,
            fasterlog(self.model.kappa_min),
            fasterlog(self.model.kappa_max),
        ))
        R = r.R
        core = out[:, R:]                                   # (B, K)
        t_estep = (core + eps_mu * fsum) * inv_nV[:, None]
        logits = jax.nn.log_softmax(t_estep * kappa, axis=1)
        latent = jnp.exp(logits)

        h = out[:, :R] * inv_nL[:, None] - P[r.x_mean] @ Wt.T
        h = h + self._sv(sv, "nb_mu_encoding.bias")
        if self.model.do_relu:
            h = jax.nn.relu(h)
        heads_w = self._sv(sv, "nb_mu_representation_mean_k.weight")
        heads_b = self._sv(sv, "nb_mu_representation_mean_k.bias")
        mu_k = jnp.einsum("nh,khr->nkr", h, heads_w) + heads_b[None]
        mu_mean = jnp.sum(mu_k * latent[:, :, None], axis=1)
        mu_lnvar = jnp.clip(
            h @ self._sv(sv, "nb_mu_representation_logvariance.weight")
            + self._sv(sv, "nb_mu_representation_logvariance.bias"),
            -4.0, 4.0,
        )
        nu_h = jax.nn.relu(ndk[:, :H] + self._sv(sv, "nb_nu_encoding.bias"))
        nu_mean = (
            nu_h @ self._sv(sv, "nb_nu_representation_mean.weight")
            + self._sv(sv, "nb_nu_representation_mean.bias")
        )
        nu_lnvar = jnp.clip(
            nu_h @ self._sv(sv, "nb_nu_representation_logvariance.weight")
            + self._sv(sv, "nb_nu_representation_logvariance.bias"),
            -4.0, 4.0,
        )
        depth = _softplus(ndk[:, H:H + 1] + self._sv(sv, "depth.bias"))

        z_mu = self._reparam(eps[0], mu_mean, mu_lnvar)
        z_nu = self._reparam(eps[1], nu_mean, nu_lnvar)
        kl = (gaussian_kl(mu_mean, mu_lnvar)
              + gaussian_kl(nu_mean, nu_lnvar)
              + uniform_kl(logits))

        wd = P[r.mu_dec_w]
        bias2 = P[r.mu_dec_b]
        wn = P[r.nu_dec_w]
        bias_n = P[r.nu_dec_b] - P[r.nu_bias]
        pb = P[r.mu_bias]
        B = x.shape[0]
        cz = jnp.zeros((B, 1), jnp.float32)
        wcz = jnp.zeros((1, x.shape[1]), jnp.float32)
        if boot:
            nll = nb_step_boot_joint_gradonly(
                x, z_mu, cz, z_nu, depth, wd, wcz, bias2, wn, bias_n, pb
            )
        else:
            nll = nb_step_report(
                x, z_mu, cz, z_nu, depth, wd, wcz, bias2, wn, bias_n,
                include_const=include_const, pb=pb, nu_exp=True,
            )

        # vMF loss without the (B, D) recon: recon = (latent @ mu^T) *
        # filt and the loss needs only <yobs, recon> =
        # sum(latent * (ybf @ mu^T), 1)  (vmfnb_mixture.hh:610-629);
        # ybf @ mu^T reuses the shared core product with the yobs
        # row-scaling (identities above)
        t = (core + eps_y * fsum) * inv_nY[:, None]          # (B, K)
        dot = jnp.sum(latent * t, axis=1)
        df = max(0.5 * dd - 1.0, 0.0)
        k = kappa[:, 0]
        llik = dot * k
        llik += df * jnp.log(k) - lbessel(k, df)
        llik -= 0.5 * dd * fasterlog(2.0 * math.pi)
        vmf_nll = -jnp.sum(llik)
        return (nll + vmf_nll + beta * kl) / B
