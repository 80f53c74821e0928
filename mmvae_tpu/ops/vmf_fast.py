"""v3 packed fast step for the vMF-VAE.

Applies the packed-step recipe (ops/nb_fast.py) to
:class:`~mmvae_tpu.models.vmf.VMFVAE` (reference
include/models/vmf.hh:191-440).  The vMF model is all-XLA (no Pallas
likelihood kernel), so its generic step's cost is dominated by repeated
per-forward data transforms and the ~10-leaf optimizer chain; the fast
path removes both:

- **Hoisted data views.**  Both per-batch transforms are
  parameter-independent and computed ONCE per batch instead of once per
  forward (4x/batch): the encoder's L2-normalized log1p counts
  (vmf.hh:250-258) and the observation direction ``yobs``
  (vmf.hh:424-428).  Bootstrap resampling gathers ROWS of these views
  (row-wise transforms commute with row gathers bitwise) — the raw
  (B, D) counts are never touched again after the views exist.
- **Hoisted encoder algebra.**  The learned standardization factors
  through the Angular first layer exactly as in nb_fast:
  ``((xn - x_mean)/sd) @ ww == xn @ (ww/sd) - x_mean @ (ww/sd)`` with
  ``ww`` the ReLU'd row-normalized weight (angular.hh:34-42), so each
  forward is two slim MXU passes with no (B, D) elementwise traffic.
- **Packed parameters** (one (K, D) matrix + one small vector, 2-leaf
  optax chain) and **pre-drawn randomness** exactly as in nb_fast; the
  PRNG schedule mirrors the generic Trainer bitwise (split -> report
  eps; fold_in(i) -> split -> resample idx, boot eps).

Unlike the NB/joint models there is no Gram collapse for the decoder:
``recon = normalize(exp(z @ W + b) + covar)`` (vmf.hh:283-290) is
elementwise-nonlinear in D, so the (B, D) reconstruction is genuinely
materialized once per forward — but only once, and XLA fuses the
exp/add/normalizer reductions into the decoder matmul's consumer.

Valid for the direct architecture (no hidden encoder/decoder layers);
callers must check :meth:`VMFFastStep.supports`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .fastmath import fasterlog
from .lbessel import lbessel
from .losses import gaussian_kl, l2_normalize
from .nb_fast import (
    PackedFastStep,
    _data_mm,
    _make_packed_optimizer,
    _softplus,
    _use_bf16_data,
)


@dataclass(frozen=True)
class _VRows:
    """Row indices of the packed (K, D) vMF parameter matrix."""

    Z: int
    C: int

    @property
    def dec_w(self):  # (Z, D)
        return slice(0, self.Z)

    @property
    def cov_dec_w(self):  # (C, D)
        return slice(self.Z, self.Z + self.C)

    @property
    def dec_b(self):
        return self.Z + self.C

    @property
    def cov_dec_b(self):
        return self.Z + self.C + 1

    @property
    def x_mean(self):
        return self.Z + self.C + 2

    @property
    def ln_x_sd(self):
        return self.Z + self.C + 3

    @property
    def enc_w(self):  # (Z, D) — transposed storage
        a = self.Z + self.C + 4
        return slice(a, a + self.Z)

    @property
    def K(self):
        return 2 * self.Z + self.C + 4


class VMFFastStep(PackedFastStep):
    """Packed fast step for :class:`~mmvae_tpu.models.vmf.VMFVAE`."""

    def __init__(self, model, opt, kl=(1.0, 1e-2, 0.1)):
        assert self.supports(model), (
            "VMFFastStep requires the direct (no hidden layer) vMF "
            "architecture"
        )
        self.model = model
        self.opt = opt
        self.kl_max, self.kl_min, self.kl_discount = kl
        self.rows = _VRows(Z=model.latent, C=model.covar_dim)
        self._sv_segs, self._sv_len = self._build_sv_layout()
        self.optimizer = _make_packed_optimizer(opt)

    @staticmethod
    def supports(model) -> bool:
        from ..models.vmf import VMFVAE

        return (
            isinstance(model, VMFVAE)
            and not model.encoding
            and not model.decoding
        )

    # ------------------------------------------------------------------
    # layout
    # ------------------------------------------------------------------
    def _build_sv_layout(self):
        Z, C = self.rows.Z, self.rows.C
        return self._seg_layout([
            ("covar_encoding.weight", (C, Z)),
            ("covar_encoding.bias", (Z,)),
            ("representation_mean.weight", (Z, Z)),
            ("representation_mean.bias", (Z,)),
            ("representation_logvariance.weight", (Z, Z)),
            ("representation_logvariance.bias", (Z,)),
            ("ln_kappa", (1,)),
        ])

    def pack(self, t: dict) -> dict:
        r = self.rows
        rows = [
            t["decoding"]["weight"],               # (Z, D)
            t["covar_decoding_"]["weight"],        # (C, D)
            t["decoding"]["bias"][None, :],
            t["covar_decoding_"]["bias"][None, :],
            t["x_mean"],                           # (1, D)
            t["ln_x_sd"],
            t["encoding"]["weight"].T,             # (Z, D)
        ]
        P = jnp.concatenate(rows, axis=0)
        assert P.shape[0] == r.K
        sv_parts = []
        for name in self._sv_segs:
            if "." in name:
                top, leaf = name.split(".")
                sv_parts.append(jnp.ravel(t[top][leaf]))
            else:
                sv_parts.append(jnp.ravel(t[name]))
        sv = jnp.concatenate(sv_parts)
        return {"P": P, "sv": sv}

    def unpack(self, q: dict) -> dict:
        P, sv = q["P"], q["sv"]
        r = self.rows
        out = {
            "x_mean": P[r.x_mean][None, :],
            "ln_x_sd": P[r.ln_x_sd][None, :],
            "decoding": {
                "weight": P[r.dec_w],
                "bias": P[r.dec_b],
            },
            "covar_decoding_": {
                "weight": P[r.cov_dec_w],
                "bias": P[r.cov_dec_b],
            },
            "encoding": {"weight": P[r.enc_w].T},
        }
        for name, (off, shape) in self._sv_segs.items():
            leaf_val = jnp.reshape(sv[off:off + math.prod(shape)], shape)
            if "." in name:
                top, leaf = name.split(".")
                out.setdefault(top, {})[leaf] = leaf_val
            else:
                out[name] = leaf_val
        return out

    # ------------------------------------------------------------------
    # compute
    # ------------------------------------------------------------------
    def _views(self, x):
        """(xn, yobs): parameter-independent per-batch hoists.

        ``xn`` is the encoder's L2-normalized log1p counts
        (vmf.hh:253-258 core, before the learned standardization);
        ``yobs`` the loss observation direction (vmf.hh:424-428).
        ``xn`` is consumed only by DEFAULT-precision dots, so bf16
        storage is bitwise-neutral on TPU (see nb_fast); ``yobs`` feeds
        an elementwise row dot and stays f32."""
        xf32 = x.astype(jnp.float32)
        L = jnp.log1p(xf32)
        xn = l2_normalize(L, axis=1)
        eps = 1e-2 / float(self.model.data_dim)
        # counts are non-negative so relu(x) == x, but keep the
        # reference op order (vmf.hh:426)
        yobs = l2_normalize(jnp.log1p(jax.nn.relu(xf32)) + eps, axis=1)
        if _use_bf16_data():
            xn = xn.astype(jnp.bfloat16)
        return xn, yobs

    def _heads(self, q, xn, c):
        """Encoder heads for all B rows; semantics == VMFVAE.encode
        (vmf.hh:250-281) via the hoisted-xn factorization, with the
        Angular first layer's weight normalization (angular.hh:34-42)
        applied to the packed transposed rows."""
        P, sv = q["P"], q["sv"]
        r = self.rows
        eps_sd = 1e-2 / float(self.model.data_dim)
        sd = _softplus(P[r.ln_x_sd]) + eps_sd              # (D,)
        # rows are encoding.weight^T: each output unit's weight vector
        # lies along the row, so the per-unit L2 norm is axis=1
        ww = l2_normalize(jax.nn.relu(P[r.enc_w]) + 1e-4, axis=1)
        Wt = ww / sd                                       # (Z, D)
        h = _data_mm(xn, Wt) - P[r.x_mean] @ Wt.T          # (B, Z)
        if self.model.do_relu:
            h = jax.nn.relu(h)  # encoder stack ReLUs its last layer
        mean = (
            h @ self._sv(sv, "representation_mean.weight")
            + self._sv(sv, "representation_mean.bias")
            + c @ self._sv(sv, "covar_encoding.weight")
            + self._sv(sv, "covar_encoding.bias")
        )
        lnvar = jnp.clip(
            h @ self._sv(sv, "representation_logvariance.weight")
            + self._sv(sv, "representation_logvariance.bias"),
            -4.0, 4.0,
        )
        return mean, lnvar

    # ------------------------------------------------------------------
    # randomness: mirrors the generic Trainer._batch_step bitwise —
    # split(key) -> (k_rep, k_boot); forward draws normal(k, (B, Z))
    # inside reparameterize (models/modules.py)
    # ------------------------------------------------------------------
    def _draw_batch(self, key, B: int):
        Z = self.rows.Z
        k_rep, k_boot = jax.random.split(key)
        rep_eps = (jax.random.normal(k_rep, (B, Z)),)

        def boot(i):
            kb = jax.random.fold_in(k_boot, i)
            k_idx, k_fwd = jax.random.split(kb)
            ridx = jax.random.randint(k_idx, (B,), 0, B)
            return ridx, jax.random.normal(k_fwd, (B, Z))

        ridx, be = jax.vmap(boot)(
            jnp.arange(self.opt.nboot, dtype=jnp.uint32)
        )
        return dict(rep_eps=rep_eps, ridx=ridx, boot_eps=(be,))

    # ------------------------------------------------------------------
    def _loss(self, q, views, x, c, ridx, eps, beta, include_const,
              boot: bool):
        del x  # raw counts live on only through the hoisted views
        xn, yobs = views
        if ridx is not None:
            # row-wise transforms commute with row gathers: gathering
            # the precomputed views is bitwise-equal to recomputing them
            # on gathered counts, and the views carry no params
            xn = jnp.take(xn, ridx, axis=0)
            yobs = jnp.take(yobs, ridx, axis=0)
            c = jnp.take(c, ridx, axis=0)
        mean, lnvar = self._heads(q, xn, c)
        z = self._reparam(eps[0], mean, lnvar)
        kl = gaussian_kl(mean, lnvar)

        P, sv = q["P"], q["sv"]
        r = self.rows
        # decoder: normalize(exp(z @ W + b) + covar) contracted against
        # yobs (vmf.hh:283-290, 419-440) without materializing the unit
        # reconstruction — only the pre-norm (B, D) activation exists,
        # and XLA fuses exp/add/square/dot into one pass over it
        u = z @ P[r.dec_w] + P[r.dec_b]
        v = jnp.exp(u) + c @ P[r.cov_dec_w] + P[r.cov_dec_b]
        nrm = jnp.maximum(
            jnp.sqrt(jnp.sum(v * v, axis=1)), 1e-12
        )
        dot = jnp.sum(yobs * v, axis=1)

        kappa = jnp.clip(
            jnp.exp(self._sv(sv, "ln_kappa")),
            self.model.kappa_min, self.model.kappa_max,
        )
        dd = float(self.model.data_dim)
        df = max(0.5 * dd - 1.0, 0.0)
        llik = (dot / nrm) * kappa
        llik += df * jnp.log(kappa) - lbessel(kappa, df)
        if include_const:
            # the reference evaluates this with Mineiro's fasterlog
            # (vmf.hh:437); parameter-independent, so boot passes skip it
            llik -= 0.5 * dd * fasterlog(2.0 * math.pi)
        n = xn.shape[0]
        return kl / n * beta - jnp.sum(llik) / n
