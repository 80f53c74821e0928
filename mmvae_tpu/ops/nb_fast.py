"""v3 NB-VAE step path: packed parameters + batch-hoisted encoder algebra.

Profiling the v2 step (ops/nb_step.py kernels inside the generic
Trainer) on a v5e shows ~45% of every batch is XLA glue around the three
Pallas kernels: four encoder/reparameterization chains, ~60 small
per-leaf optimizer fusions, and the scheduling gaps between ~160 tiny
ops.  This module removes that glue while keeping the reference
semantics (include/mmvae_alg.hh:277-311) exactly:

- **Packed parameters.**  Every D-sized parameter row lives in ONE
  stacked (K, D) float32 matrix ``P`` and every small parameter in one
  flat vector ``sv``; the optax chain (clip -> weight decay -> Adam ->
  lr) runs on this two-leaf pytree, so a boot update is ~6 fusions
  instead of ~60.  Elementwise optimizer math is layout-invariant, so
  trajectories are unchanged (the global-norm clip reassociates its
  sum; measured drift is in the documented golden band).
- **Factored + fused encoder algebra.**  The learned standardization
  (nb.hh:312-319) factors as ``xn @ W = L @ (W / sd) - (x_mean / sd^T W)``
  with ``L = log1p(x)`` parameter-independent, so each encoder pass is
  two (B, D) contractions against L and the raw counts.  Both run in
  the fused count-encoder kernel (ops/enc_kernel.py), which builds
  L/xf IN-REGISTER from the int16 counts: per encoder pass the only
  (B, D) HBM traffic is one read of the count tensor forward and one
  backward — no materialized float views, no separate dot reads.
- **Gather placement.**  Bootstrap resampling gathers the INPUT rows
  and re-encodes them (``_loss``): although ``(L[ridx] @ W) ==
  (L @ W)[ridx]`` bitwise (row-independent dots), differentiating
  through a row-gather of the head outputs makes XLA scatter-add the
  cotangents back over all B rows (~36 us/batch measured) — encoding
  the gathered rows costs the same fused contractions with a plain
  dense backward.  Only the int16 ``x`` is gathered (half the bytes
  of the f32 gather it replaces).

The likelihood/gradient heavy lifting stays in the v2 single-pass
Pallas kernels (ops/nb_step.py).  Valid for the reference's default
architecture (no mu hidden layers: direct D->R encoder, nb.hh:342-349,
and direct R->D decoder, nb.hh:364-379); callers must check
:meth:`NBFastStep.supports` and fall back to the generic path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from .enc_kernel import count_encode
from .losses import gaussian_kl, kl_weight_schedule
from .nb_step import nb_step_boot_gradonly, nb_step_report


def _softplus(x):
    return jax.nn.softplus(x)


def _use_bf16_data() -> bool:
    """Store the (B, D) encoder operands (log1p counts / raw counts) in
    bfloat16 on TPU.

    The TPU's DEFAULT-precision f32 dot rounds BOTH operands to bf16 and
    accumulates in f32 (verified bitwise on-device: ``a @ b`` equals
    ``dot(bf16(a), bf16(b), preferred_element_type=f32)`` for the exact
    (100, 20000) shapes of this path, forward and weight-grad).  Storing
    the activations pre-rounded is therefore BIT-IDENTICAL on TPU while
    halving the HBM traffic of the tensors the per-boot encoder re-reads
    (4 forward + 3 backward passes per batch).  CPU dots are true f32,
    so this stays TPU-only — the pinned CPU trajectory tests see
    unchanged math."""
    return jax.default_backend() in ("tpu", "axon")


def _encoder_views(x):
    """(log1p(x), float(x)) encoder operands from raw counts, in the
    dtype :func:`_use_bf16_data` selects.  XLA fuses these elementwise
    conversions into the consuming dot's x read — no materialized
    (B, D) intermediate."""
    xf = x.astype(jnp.float32)
    L = jnp.log1p(xf)
    if _use_bf16_data():
        L = L.astype(jnp.bfloat16)
        xf = xf.astype(jnp.bfloat16)
    return L, xf


def _data_mm(a, w):
    """``a @ w.T`` for a (B, D) data activation and (K, D) parameter
    rows, differentiable in ``w`` only.

    When ``a`` is bf16 (TPU path, :func:`_use_bf16_data`) both dots cast
    their operands to bf16 explicitly and accumulate in f32 — the same
    rounding the DEFAULT f32 dot applies internally, so results (and the
    f32 weight gradient) are bitwise equal to the f32-stored path."""
    if a.dtype != jnp.bfloat16:
        return a @ w.T

    @jax.custom_vjp
    def mm(w):
        return jax.lax.dot_general(
            a, w.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def fwd(w):
        return mm(w), None

    def bwd(_, g):
        dw = jax.lax.dot_general(
            g.astype(jnp.bfloat16), a, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (dw,)

    mm.defvjp(fwd, bwd)
    return mm(w)


@dataclass(frozen=True)
class _Rows:
    """Row indices of the packed (K, D) parameter matrix."""

    R: int
    C: int
    H: int
    Rn: int

    @property
    def mu_dec_w(self):  # (R, D)
        return slice(0, self.R)

    @property
    def cov_dec_w(self):  # (C, D)
        return slice(self.R, self.R + self.C)

    @property
    def mu_dec_b(self):
        return self.R + self.C

    @property
    def cov_dec_b(self):
        return self.R + self.C + 1

    @property
    def mu_bias(self):
        return self.R + self.C + 2

    @property
    def nu_dec_w(self):  # (Rn, D)
        a = self.R + self.C + 3
        return slice(a, a + self.Rn)

    @property
    def nu_dec_b(self):
        return self.R + self.C + 3 + self.Rn

    @property
    def nu_bias(self):
        return self.R + self.C + 4 + self.Rn

    @property
    def x_mean(self):
        return self.R + self.C + 5 + self.Rn

    @property
    def ln_x_sd(self):
        return self.R + self.C + 6 + self.Rn

    @property
    def mu_enc_w(self):  # (R, D) — transposed storage
        a = self.R + self.C + 7 + self.Rn
        return slice(a, a + self.R)

    @property
    def nu_enc_w(self):  # (H, D) — transposed storage
        a = self.R + self.C + 7 + self.Rn + self.R
        return slice(a, a + self.H)

    @property
    def depth_w(self):  # (1, D) — transposed storage
        return self.R + self.C + 7 + self.Rn + self.R + self.H

    @property
    def nd_rows(self):  # (H+1, D): nu_enc_w rows then the depth row —
        # adjacent by construction, so the nu/depth encoder matmuls
        # share ONE pass over the (B, D) counts
        a = self.R + self.C + 7 + self.Rn + self.R
        return slice(a, a + self.H + 1)

    @property
    def K(self):
        return self.R + self.C + 8 + self.Rn + self.R + self.H


class PackedFastStep:
    """Shared skeleton of the packed fast-step path.

    Subclasses define the model-specific pieces — ``pack``/``unpack``
    between the named parameter dict (artifact / checkpoint surface) and
    the packed ``{"P": (K, D), "sv": (n,)}`` compute layout,
    ``_views(x)`` (the parameter-independent per-batch data hoists),
    ``_draw_batch`` (the model's exact PRNG schedule) and ``_loss`` —
    while :meth:`batch_step` / :meth:`draw_rand` / the packed optimizer
    plumbing are common.  The epoch runners in train/loop.py drive any
    subclass through this one protocol."""

    # ------------------------------------------------------------------
    # adam-state conversion: the chain is (clip, wd, adam, lr); only the
    # ScaleByAdamState's mu/nu trees are params-shaped
    # ------------------------------------------------------------------
    # ------------------------------------------------------------------
    # small-vector segment table: shared by every subclass's
    # _build_sv_layout / _sv / unpack
    # ------------------------------------------------------------------
    @staticmethod
    def _seg_layout(entries):
        """``name -> (offset, shape)`` segment table + total length for
        the packed small-vector leaf."""
        segs, off = {}, 0
        for name, shape in entries:
            segs[name] = (off, shape)
            off += math.prod(shape)
        return segs, off

    def _sv(self, sv, name):
        """View one named segment of the packed small vector."""
        off, shape = self._sv_segs[name]
        return jnp.reshape(sv[off:off + math.prod(shape)], shape)

    def pack_opt_state(self, opt_state):
        adam = opt_state[2]
        packed = adam._replace(mu=self.pack(adam.mu), nu=self.pack(adam.nu))
        return tuple(opt_state[:2]) + (packed,) + tuple(opt_state[3:])

    def unpack_opt_state(self, opt_state):
        adam = opt_state[2]
        named = adam._replace(
            mu=self.unpack(adam.mu), nu=self.unpack(adam.nu)
        )
        return tuple(opt_state[:2]) + (named,) + tuple(opt_state[3:])

    @staticmethod
    def _reparam(eps, mean, lnvar):
        sig = jnp.exp(lnvar / 2.0)
        return mean + eps * sig

    def draw_rand(self, ekey, batch_ids, B: int, axis_name=None):
        """Pre-draw :meth:`_draw_batch` for a whole epoch of batch ids,
        vectorized.  Hoisting the threefry chains out of the sequential
        batch scan removes ~25 us/batch of tiny key-derivation kernels
        from the hot path; the scan consumes the stacked pytree as a
        sliced ``xs`` input.  Bitwise identical to in-step draws."""

        def one(b):
            key = jax.random.fold_in(ekey, b)
            if axis_name is not None:
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(axis_name)
                )
            return self._draw_batch(key, B)

        return jax.vmap(one)(batch_ids)

    def rand_pspecs(self, P, axis_name="data"):
        """PartitionSpec tree for :meth:`draw_rand`'s output with the
        per-batch ROW axis sharded over ``axis_name`` (each DP shard
        draws its own rows via the axis_index fold).  Built from the
        subclass's actual ``_draw_batch`` structure: rep_eps leaves are
        (B, ...) -> row axis 1 after the epoch vmap; ridx/boot_eps
        leaves are (nboot, B, ...) -> row axis 2."""
        sample = jax.eval_shape(
            lambda k: self._draw_batch(k, 2), jax.random.PRNGKey(0)
        )
        return dict(
            rep_eps=tuple(
                P(None, axis_name, *([None] * (l.ndim - 1)))
                for l in sample["rep_eps"]
            ),
            ridx=P(None, None, axis_name),
            boot_eps=tuple(
                P(None, None, axis_name, *([None] * (l.ndim - 2)))
                for l in sample["boot_eps"]
            ),
        )

    def batch_step(self, q, opt_state, x, c, epoch_f, key=None,
                   axis_name=None, rand=None):
        """One reference batch step on packed state: reporting forward +
        nboot bootstrap-resampled Adam steps (mmvae_alg.hh:277-311).

        Randomness comes either from ``key`` (drawn in-step) or from a
        pre-drawn ``rand`` slice of :meth:`draw_rand` — bitwise
        equivalent; epoch runners pass ``rand`` so the threefry chains
        run once, vectorized, outside the batch scan."""
        beta = kl_weight_schedule(
            epoch_f, self.kl_max, self.kl_min, self.kl_discount
        )
        B = x.shape[0]
        if rand is None:
            if axis_name is not None:
                key = jax.random.fold_in(
                    key, jax.lax.axis_index(axis_name)
                )
            rand = self._draw_batch(key, B)

        views = self._views(x)

        report = self._loss(q, views, x, c, None, rand["rep_eps"], beta,
                            include_const=True, boot=False)
        if axis_name is not None:
            report = jax.lax.pmean(report, axis_name)

        def boot_body(i, carry):
            q, opt_state = carry
            ridx = rand["ridx"][i]
            eps = tuple(e[i] for e in rand["boot_eps"])
            grads = jax.grad(
                lambda qq: self._loss(qq, views, x, c, ridx, eps, beta,
                                      include_const=False, boot=True)
            )(q)
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
            updates, opt_state = self.optimizer.update(
                grads, opt_state, q
            )
            q = optax.apply_updates(q, updates)
            return q, opt_state

        # nboot is static and small: unroll in Python — identical math
        # to a fori_loop, but XLA schedules the three boot bodies
        # without while-loop sequencing overhead
        if self.opt.nboot <= 8:
            carry = (q, opt_state)
            for i in range(self.opt.nboot):
                carry = boot_body(i, carry)
            q, opt_state = carry
        else:
            q, opt_state = jax.lax.fori_loop(
                0, self.opt.nboot, boot_body, (q, opt_state)
            )
        return q, opt_state, report


class NBFastStep(PackedFastStep):
    """Packed-parameter fused step for :class:`~mmvae_tpu.models.nb.NBVAE`.

    Converts between the model's named parameter dict (artifact /
    checkpoint surface) and the packed `{P: (K, D), sv: (n,)}` compute
    layout, and runs the whole reference batch step — reporting forward
    plus ``nboot`` bootstrap Adam steps — on the packed representation.
    """


    def __init__(self, model, opt, kl=(1.0, 1e-2, 0.1)):
        assert self.supports(model), (
            "NBFastStep requires the direct (no hidden layer) NB "
            "architecture"
        )
        self.model = model
        self.opt = opt
        self.kl_max, self.kl_min, self.kl_discount = kl
        self.rows = _Rows(
            R=model.mean_latent,
            C=model.covar_dim,
            H=model.overdisp_encoding,
            Rn=model.overdisp_latent,
        )
        # small-vector segment table: name -> (offset, shape)
        self._sv_segs, self._sv_len = self._build_sv_layout()
        self.optimizer = _make_packed_optimizer(opt)

    @staticmethod
    def supports(model) -> bool:
        from ..models.nb import NBVAE

        return (
            isinstance(model, NBVAE)
            and not model.mean_encoding
            and not model.mean_decoding
        )

    # ------------------------------------------------------------------
    # layout
    # ------------------------------------------------------------------
    def _build_sv_layout(self):
        R, C, H, Rn = (self.rows.R, self.rows.C, self.rows.H, self.rows.Rn)
        return self._seg_layout([
            ("mu_encoding.bias", (R,)),
            ("covar_encoding.weight", (C, R)),
            ("covar_encoding.bias", (R,)),
            ("mu_representation_mean.weight", (R, R)),
            ("mu_representation_mean.bias", (R,)),
            ("mu_representation_logvariance.weight", (R, R)),
            ("mu_representation_logvariance.bias", (R,)),
            ("nu_encoding.bias", (H,)),
            ("nu_representation_mean.weight", (H, Rn)),
            ("nu_representation_mean.bias", (Rn,)),
            ("nu_representation_logvariance.weight", (H, Rn)),
            ("nu_representation_logvariance.bias", (Rn,)),
            ("depth.bias", (1,)),
        ])

    # ------------------------------------------------------------------
    # pack / unpack (work on params AND on Adam-moment trees, which share
    # the params' structure — elementwise moments pack identically)
    # ------------------------------------------------------------------
    def pack(self, t: dict) -> dict:
        r = self.rows
        rows = [
            t["mu_decoding"]["weight"],            # (R, D)
            t["covar_decoding"]["weight"],         # (C, D)
            t["mu_decoding"]["bias"][None, :],
            t["covar_decoding"]["bias"][None, :],
            t["mu_bias"],                          # (1, D)
            t["nu_decoding"]["weight"],            # (Rn, D)
            t["nu_decoding"]["bias"][None, :],
            t["nu_bias"],
            t["x_mean"],
            t["ln_x_sd"],
            t["mu_encoding"]["weight"].T,          # (R, D)
            t["nu_encoding"]["weight"].T,          # (H, D)
            t["depth"]["weight"].T,                # (1, D)
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
            "mu_decoding": {
                "weight": P[r.mu_dec_w],
                "bias": P[r.mu_dec_b],
            },
            "covar_decoding": {
                "weight": P[r.cov_dec_w],
                "bias": P[r.cov_dec_b],
            },
            "nu_decoding": {
                "weight": P[r.nu_dec_w],
                "bias": P[r.nu_dec_b],
            },
            "mu_encoding": {"weight": P[r.mu_enc_w].T},
            "nu_encoding": {"weight": P[r.nu_enc_w].T},
            "depth": {"weight": P[r.depth_w][:, None]},
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
        # log1p/raw views in-register per contraction — nothing to hoist
        return None

    def _heads(self, q, x, c):
        """Encoder heads for the given count rows.

        Semantics == NBVAE.encode_mu/encode_nu + the depth head
        (nb.hh:403-431, 444-451, 498) via the hoisted-L factorization;
        the two (B, D) contractions (and their log1p/raw operand views)
        run in the fused count-encoder kernel, which reads the int
        counts once per pass and never materializes a (B, D) float
        tensor (ops/enc_kernel.py; XLA fallback is bitwise the old
        path).
        """
        P, sv = q["P"], q["sv"]
        r = self.rows
        H = self.rows.H
        sd = _softplus(P[r.ln_x_sd]) + 1e-4                # (D,)
        Wt = P[r.mu_enc_w] / sd                            # (R, D)
        hL, nd, _ = count_encode(x, Wt, P[r.nd_rows], None, False)
        h = hL - P[r.x_mean] @ Wt.T                        # (B, R)
        h = h + self._sv(sv, "mu_encoding.bias")
        if self.model.do_relu:
            h = jax.nn.relu(h)
        mu_mean = (
            h @ self._sv(sv, "mu_representation_mean.weight")
            + self._sv(sv, "mu_representation_mean.bias")
            + c @ self._sv(sv, "covar_encoding.weight")
            + self._sv(sv, "covar_encoding.bias")
        )
        mu_lnvar = jnp.clip(
            h @ self._sv(sv, "mu_representation_logvariance.weight")
            + self._sv(sv, "mu_representation_logvariance.bias"),
            -4.0, 4.0,
        )
        nu_h = nd[:, :H] + self._sv(sv, "nu_encoding.bias")
        nu_mean = (
            nu_h @ self._sv(sv, "nu_representation_mean.weight")
            + self._sv(sv, "nu_representation_mean.bias")
        )
        nu_lnvar = jnp.clip(
            nu_h @ self._sv(sv, "nu_representation_logvariance.weight")
            + self._sv(sv, "nu_representation_logvariance.bias"),
            -4.0, 4.0,
        )
        depth = _softplus(
            nd[:, H:] + self._sv(sv, "depth.bias")
        )                                                  # (B, 1)
        return mu_mean, mu_lnvar, nu_mean, nu_lnvar, depth

    def _kernel_rows(self, P):
        r = self.rows
        wd = P[r.mu_dec_w]
        wc = P[r.cov_dec_w]
        bias2 = P[r.mu_dec_b] + P[r.cov_dec_b] + P[r.mu_bias]
        wn = P[r.nu_dec_w]
        bias_n = P[r.nu_dec_b] - P[r.nu_bias]
        return wd, wc, bias2, wn, bias_n

    # ------------------------------------------------------------------
    # randomness
    # ------------------------------------------------------------------
    def _draw_batch(self, key, B: int):
        """Every random draw one batch step consumes, in the exact
        derivation order of the in-step schedule (split -> report eps;
        fold_in(i) -> split -> resample idx, boot eps).  Counter-based
        PRNG makes each draw a pure function of its key, so computing
        them here (or vmapped over batches) is bitwise identical to
        drawing inside the step."""
        R, Rn = self.rows.R, self.rows.Rn
        k_rep, k_boot = jax.random.split(key)
        km, kn = jax.random.split(k_rep)
        rep_eps = (jax.random.normal(km, (B, R)),
                   jax.random.normal(kn, (B, Rn)))

        def boot(i):
            kb = jax.random.fold_in(k_boot, i)
            k_idx, k_fwd = jax.random.split(kb)
            ridx = jax.random.randint(k_idx, (B,), 0, B)
            bm, bn = jax.random.split(k_fwd)
            return (ridx, jax.random.normal(bm, (B, R)),
                    jax.random.normal(bn, (B, Rn)))

        ridx, be_mu, be_nu = jax.vmap(boot)(
            jnp.arange(self.opt.nboot, dtype=jnp.uint32)
        )
        return dict(rep_eps=rep_eps, ridx=ridx, boot_eps=(be_mu, be_nu))

    def _loss(self, q, views, x, c, ridx, eps, beta, include_const,
              boot: bool):
        del views
        if ridx is not None:
            # resample the INPUT rows, not the encoder outputs: the
            # forward is row-wise so heads(x[ridx]) == heads(x)[ridx]
            # bitwise, but differentiating through a row-gather makes
            # XLA scatter-add the head cotangents back over all B rows
            # (~36 us/batch measured) — encoding the gathered rows
            # instead costs the same dots with plain dense backward
            x = jnp.take(x, ridx, axis=0)
            c = jnp.take(c, ridx, axis=0)
        heads = self._heads(q, x, c)
        mu_mean, mu_lnvar, nu_mean, nu_lnvar, depth = heads
        z_mu = self._reparam(eps[0], mu_mean, mu_lnvar)
        z_nu = self._reparam(eps[1], nu_mean, nu_lnvar)
        kl = gaussian_kl(mu_mean, mu_lnvar) + gaussian_kl(nu_mean, nu_lnvar)
        wd, wc, bias2, wn, bias_n = self._kernel_rows(q["P"])
        # boot losses are consumed by jax.grad only — the grad-only
        # kernel skips the primal's lgamma/log VPU ops entirely
        step_fn = nb_step_boot_gradonly if boot else (
            lambda *a: nb_step_report(*a, include_const=include_const)
        )
        nll = step_fn(x, z_mu, c, z_nu, depth, wd, wc, bias2, wn, bias_n)
        return (nll + beta * kl) / x.shape[0]


def _make_packed_optimizer(opt) -> optax.GradientTransformation:
    """Same chain as train.loop.make_optimizer, over the packed pytree."""
    return optax.chain(
        optax.clip_by_global_norm(opt.grad_clip),
        optax.add_decayed_weights(opt.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-opt.lr),
    )
