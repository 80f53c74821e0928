"""Single-pass fused NB-VAE step kernels (v2 of ops/nb_elbo.py).

Profiling the training step shows the per-boot cost is dominated by the
ELBO kernel pair: a forward that reads the materialized (B, D) decoder
logits twice and a backward that recomputes all activations and writes
two (B, D) gradient tensors for XLA to contract.  This module removes
every (B, D) intermediate:

- logits ``h = z_mu @ Wd + c @ Wc + bias`` and the overdispersion
  pre-activation are computed *inside* the kernels from the (B, R)
  latents — the only (B, D) tensor ever read is ``x`` itself;
- the boot-step kernel computes the loss AND every parameter/latent
  gradient in ONE pass over x.  This exploits the fact that the
  upstream cotangent of a scalar training loss is a known scalar: the
  custom VJP saves the (tiny) gradients as residuals and its backward
  merely scales them;
- the softmax coupling ``dh = dls - softmax(h) * rowsum(dls)`` is
  resolved without a second x pass: the kernel accumulates
  ``R = rowsum(dls)`` and the rank-structured second terms
  (``colsum(zm_r * R * p)`` etc.) are produced by a cheap finisher
  kernel that recomputes ``p`` from the latents only (no x read);
- counts are integers: each kernel checks its own column tile at
  runtime, and where all counts are integers <= 7 the
  ``lgamma(nu) - lgamma(nu+x)`` and ``digamma`` differences collapse to
  a select-product ``P = prod_{k<x}(nu+k)`` with derivative ``dP``:
  one log and one divide replace four lgamma/digamma evaluations
  (the reference evaluates dense torch lgamma over all of (B, D);
  include/models/nb.hh:511-531);
- ``x`` may be passed as int16/int8: counts are integers, so narrow
  storage halves the HBM traffic of the dominant tensor with bit-exact
  f32 values after the in-kernel widening.

Reference formulas (include/models/nb.hh:433-460 decoders, :511-531
loss) are preserved exactly up to float reassociation; the fast path
is *more* accurate than the Stirling-based lgamma (the product is exact
up to f32 rounding).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nb_elbo import (
    EPS,
    NU_HI,
    NU_LO,
    _digamma_pos,
    _lgamma_pos,
    _stirling_digamma,
    _stirling_lgamma,
)

_INTERPRET = False  # flipped by tests on CPU

_TD = 1024          # lane tile width: retuned 512 -> 1024 after the
                    # rank-k contractions moved to the MXU (cc53f11);
                    # 2048 measured slower, and pre-MXU 1024 was too
                    # (the old CLAUDE.md dead-end refers to that regime)


_SLOT_CAP = 104 * 2048  # bp x td budget: ~13 MB scoped VMEM worst case


def _tile_for(bp: int) -> int:
    """Lane tile width for a padded batch of ``bp`` rows.

    The step kernels' scoped VMEM scales ~ bp x tile (several (bp, td)
    f32 accumulators plus double-buffered operand blocks); at the
    reference batch (bp=104) the fastest tile is 1024, but larger
    batches must narrow the tile to stay under Mosaic's 16 MB scoped
    VMEM (measured: bp=400 x td=1024 wants 26.6 MB).  The tile floors
    at 128 lanes, so batches past ``_SLOT_CAP / 128`` padded rows have
    no legal tile — ``_use_kernel`` routes those to the XLA step."""
    td = _TD
    while td > 128 and bp * td > _SLOT_CAP:
        td //= 2
    return td
_XMAX_FAST = 7.0   # fast path covers integer counts 0..7


def _use_kernel(D: int, B: int | None = None) -> bool:
    if _INTERPRET:
        return True
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if B is not None and _ceil_to(B, 8) * 128 > _SLOT_CAP:
        return False  # no tile narrow enough fits scoped VMEM
    return D >= 512


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


# ----------------------------------------------------------------------
# XLA fallback / semantic spec
# ----------------------------------------------------------------------

def xla_step_nll(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n, pb=None,
                 include_const: bool = False, nu_exp: bool = False,
                 model_axis: str | None = None):
    """Plain-XLA spec of the fused step NLL (differentiable).

    ``pb`` is an optional (D,) log-bias applied AFTER log_softmax (the
    joint model's mu_bias placement, vmfnb.hh:466); ``nu_exp`` switches
    the overdispersion decode from softplus-clip (nb.hh:453-460) to
    ``clamp(exp(.), 0, NU_HI)`` (vmfnb.hh:488-493).  With ``model_axis``
    the D axis of every operand is a shard of a mesh axis: the softmax
    normalizer and the scalar NLL are combined with psum/pmax
    collectives (TP; SURVEY §5.7)."""
    x = jnp.asarray(x, jnp.float32)
    h = zm @ wd + c @ wc + bias2
    if model_axis is not None:
        # NOTE the plain psum: its cotangents are PER-SHARD (each
        # shard's local-D loss terms consume s), so the summing default
        # transpose is the correct one here — unlike the final nll
        # reduction below, whose cotangent is replicated.
        m = jax.lax.pmax(
            jax.lax.stop_gradient(jnp.max(h, axis=1, keepdims=True)),
            model_axis,
        )
        s = jax.lax.psum(
            jnp.sum(jnp.exp(h - m), axis=1, keepdims=True), model_axis
        )
        ls = h - (m + jnp.log(s))
    else:
        ls = jax.nn.log_softmax(h, axis=1)
    if pb is not None:
        ls = ls + pb
    mu = jnp.exp(ls) * depth + EPS
    nu_pre = zn @ wn + bias_n
    if nu_exp:
        nu = jnp.clip(jnp.exp(nu_pre), 0.0, NU_HI) + EPS
    else:
        nu = jnp.clip(jax.nn.softplus(nu_pre), NU_LO, NU_HI) + EPS
    denom = jnp.log(mu + nu)
    terms = (
        jax.lax.lgamma(nu)
        - jax.lax.lgamma(nu + x)
        + x * (denom - jnp.log(mu))
        + nu * (denom - jnp.log(nu))
    )
    if include_const:
        terms = terms + jax.lax.lgamma(x + 1.0)
    nll = jnp.sum(terms)
    if model_axis is not None:
        from ..parallel.collectives import psum_id_grad

        nll = psum_id_grad(nll, model_axis)
    return nll


# ----------------------------------------------------------------------
# shared in-kernel pieces
# ----------------------------------------------------------------------

_MM_PREC = jax.lax.Precision.DEFAULT


def _mm(a, b, ca: int, cb: int):
    """In-kernel MXU contraction: contract ``a`` dim ``ca`` with ``b``
    dim ``cb``, f32 accumulation.  DEFAULT precision (bf16 multiplies)
    matches the plain-XLA spec, whose dots are DEFAULT too — Mosaic
    supports only DEFAULT/HIGHEST, and HIGHEST's multi-pass relayouts
    measured SLOWER than the VPU fma chain this replaces (98k vs 130k
    cells/sec).  Golden-trajectory impact validated end-to-end against
    the documented 101-epoch ELBO band (BASELINE_MEASURED.md)."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())),
        precision=_MM_PREC, preferred_element_type=jnp.float32,
    )


def _compute_h(wt, zc, R: int, C: int):
    """Logits tile from the resident latent block zc = [zm | c] and the
    stacked weight tile (rows: [wd(R) | wc(C) | bias2 | wn(Rn) |
    bias_n]) — one (bp, R+C) x (R+C, td) MXU pass plus the bias row."""
    return _mm(zc, wt[:R + C, :], 1, 0) + wt[R + C:R + C + 1, :]


def _compute_nupre(wt, zn_ref, R: int, C: int, Rn: int):
    npre = wt[R + C + 1 + Rn:R + C + 2 + Rn, :]
    for r in range(Rn):
        npre = npre + zn_ref[:, r:r + 1] * wt[R + C + 1 + r:R + C + 2 + r, :]
    return npre


def _col_valid(j, td: int, D: int, B: int, bp: int):
    cols = j * td + jax.lax.broadcasted_iota(jnp.int32, (1, td), 1)
    valid = cols < D
    if bp > B:
        rows = jax.lax.broadcasted_iota(jnp.int32, (bp, 1), 0)
        valid = valid & (rows < B)
    return valid


def _fast_flag(x, valid, x_is_int: bool):
    """Scalar: 1.0 iff every valid count in the tile is an integer in
    [0, _XMAX_FAST] (the select-product path is exact there)."""
    ok = (x >= 0.0) & (x <= _XMAX_FAST)
    if not x_is_int:
        ok = ok & (x == jnp.floor(x))
    return jnp.min(jnp.where(valid, ok.astype(jnp.float32), 1.0))


def _int_flag(x, valid):
    """Scalar: 1.0 iff every valid count is a non-negative integer (any
    magnitude) — the mixed product/Stirling path applies."""
    ok = (x >= 0.0) & (x == jnp.floor(x))
    return jnp.min(jnp.where(valid, ok.astype(jnp.float32), 1.0))


def _mixed_lgdg(x, nu, need_dg: bool, need_const: bool,
                need_lg: bool = True):
    """lgamma/digamma differences for ALL-INTEGER tiles with counts of
    any size (the depth~1000 regime that defeats the <=7 fast path).

    One select-product chain serves both regimes: for x <= 7 it is the
    exact ``P = prod_{k<x}(nu+k)``; for x > 7 it saturates at
    ``P7(nu) = prod_{k<7}(nu+k)``, which is precisely the shift product
    of an always-shifted Stirling form, so

        lgamma(nu) - lgamma(nu+x)
            = -log P                                        (x <= 7)
            = stirling(nu+7) - log P - stirling(nu+x)       (x  > 7)

    and the digamma difference analogously via dP/P.  nu+x >= 8 in the
    large branch, so direct Stirling is accurate; total cost ~10
    special-function ops vs ~36 for four independent lgamma/digamma
    evaluations.  Returns (lg, dg_or_None, const_or_None) where
    ``const`` is lgamma(x+1).
    """
    P, dP, Pc = _fast_products(x, nu, need_dg=need_dg,
                               need_const=need_const)
    small = x <= _XMAX_FAST
    lg = None
    if need_lg:
        big_corr = _stirling_lgamma(nu + 7.0) - _stirling_lgamma(
            jnp.maximum(nu + x, 8.0)
        )
        lg = -jnp.log(P) + jnp.where(small, 0.0, big_corr)
    dg = None
    if need_dg:
        big_dg = _stirling_digamma(nu + 7.0) - _stirling_digamma(
            jnp.maximum(nu + x, 8.0)
        )
        dg = -dP / P + jnp.where(small, 0.0, big_dg)
    const = None
    if need_const:
        # lgamma(x+1): exact factorial for x <= 7, Stirling at >= 9
        const = jnp.where(
            small, jnp.log(Pc), _stirling_lgamma(jnp.maximum(x, 8.0) + 1.0)
        )
    return lg, dg, const


def _fast_products(x, nu, need_dg: bool, need_const: bool):
    """Select-products for integer x in [0, 7]:

    P  = prod_{k<x}(nu+k)       -> lgamma(nu) - lgamma(nu+x) = -log(P)
    dP = dP/dnu                 -> digamma diff = -dP/P
    Pc = x!                     -> lgamma(x+1) = log(Pc)
    """
    P = jnp.ones_like(nu)
    dP = jnp.zeros_like(nu) if need_dg else None
    for k in range(int(_XMAX_FAST)):
        sel = x > float(k)
        m = nu + float(k)
        if need_dg:
            dP = jnp.where(sel, dP * m + P, dP)
        P = jnp.where(sel, P * m, P)
    Pc = None
    if need_const:
        Pc = jnp.ones_like(nu)
        for k in range(2, int(_XMAX_FAST) + 1):
            Pc = jnp.where(x >= float(k), Pc * float(k), Pc)
    return P, dP, Pc


# ----------------------------------------------------------------------
# kernel 1: online logsumexp of the in-kernel logits
# ----------------------------------------------------------------------

def _make_lse_kernel(R: int, C: int, td: int, D: int):
    def kernel(zc_ref, w_ref, lse_ref, m_ref, s_ref):
        j = pl.program_id(0)
        nj = pl.num_programs(0)

        @pl.when(j == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
            s_ref[:] = jnp.zeros_like(s_ref)

        h = _compute_h(w_ref[:], zc_ref[:], R, C)
        cols = j * td + jax.lax.broadcasted_iota(jnp.int32, (1, td), 1)
        h = jnp.where(cols < D, h, -jnp.inf)
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(h, axis=1, keepdims=True))
        s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.where(cols < D, jnp.exp(h - m_new), 0.0),
            axis=1, keepdims=True,
        )
        m_ref[:] = m_new

        @pl.when(j == nj - 1)
        def _():
            lse_ref[:] = m_ref[:] + jnp.log(s_ref[:])

    return kernel


def _lse_call(zm, c, W, bp: int, Dp: int, td: int, D: int, R: int, C: int):
    nj = Dp // td
    Tp = W.shape[0]
    kernel = _make_lse_kernel(R, C, td, D)
    zc = jnp.concatenate([zm, c], axis=1)
    return pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((bp, R + C), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, td), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, 1), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bp, 1), jnp.float32),
            pltpu.VMEM((bp, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(zc, W)


# ----------------------------------------------------------------------
# kernel 2a: value-only pass (reporting loss)
# ----------------------------------------------------------------------

def _make_value_kernel(R, C, Rn, td, D, B, bp, with_const: bool,
                       x_is_int: bool, has_pb: bool = False,
                       nu_exp: bool = False):
    pbi = R + C + 2 + Rn  # stacked row of the post-softmax log-bias

    def kernel(x_ref, zc_ref, zn_ref, depth_ref, lse_ref, w_ref,
               nll_ref, acc_ref, lg_ref):
        j = pl.program_id(0)
        nj = pl.num_programs(0)

        @pl.when(j == 0)
        def _():
            acc_ref[0, 0] = 0.0

        wt = w_ref[:]
        valid = _col_valid(j, td, D, B, bp)
        x = x_ref[:].astype(jnp.float32)
        h = _compute_h(wt, zc_ref[:], R, C)
        ls = h - lse_ref[:]
        p = jnp.exp(ls)
        if has_pb:
            p = p * jnp.exp(wt[pbi:pbi + 1, :])
        mu = p * depth_ref[:] + EPS
        nupre = _compute_nupre(wt, zn_ref, R, C, Rn)
        if nu_exp:
            nu = jnp.clip(jnp.exp(nupre), 0.0, NU_HI) + EPS
        else:
            nu = jnp.clip(jax.nn.softplus(nupre), NU_LO, NU_HI) + EPS

        fast = _fast_flag(x, valid, x_is_int) > 0.5
        allint = True if x_is_int else (_int_flag(x, valid) > 0.5)

        @pl.when(fast)
        def _():
            P, _, Pc = _fast_products(x, nu, need_dg=False,
                                      need_const=with_const)
            if with_const:
                lg_ref[:] = jnp.log(Pc / P)
            else:
                lg_ref[:] = -jnp.log(P)

        @pl.when(jnp.logical_not(fast) & allint)
        def _():
            lg, _, const = _mixed_lgdg(x, nu, need_dg=False,
                                       need_const=with_const)
            lg_ref[:] = (lg + const) if with_const else lg

        if not x_is_int:
            @pl.when(jnp.logical_not(allint))
            def _():
                lg = _lgamma_pos(nu) - _lgamma_pos(nu + x)
                if with_const:
                    lg = lg + _lgamma_pos(x + 1.0)
                lg_ref[:] = lg

        denom = jnp.log(mu + nu)
        terms = (
            lg_ref[:]
            + x * (denom - jnp.log(mu))
            + nu * (denom - jnp.log(nu))
        )
        acc_ref[0, 0] += jnp.sum(jnp.where(valid, terms, 0.0))

        @pl.when(j == nj - 1)
        def _():
            nll_ref[0, 0] = acc_ref[0, 0]

    return kernel


def _value_call(x, zm, c, zn, depth, lse, W, *, D, B, with_const,
                has_pb=False, nu_exp=False):
    bp, Dp = x.shape
    td = _tile_for(bp)
    nj = Dp // td
    Tp = W.shape[0]
    R, C, Rn = zm.shape[1], c.shape[1], zn.shape[1]
    x_is_int = jnp.issubdtype(x.dtype, jnp.integer)
    kernel = _make_value_kernel(R, C, Rn, td, D, B, bp, with_const,
                                x_is_int, has_pb, nu_exp)
    zc = jnp.concatenate([zm, c], axis=1)
    nll = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((bp, td), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, R + C), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, Rn), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, td), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((bp, td), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x, zc, zn, depth, lse, W)
    return nll[0, 0]


# ----------------------------------------------------------------------
# kernel 2b: fused value + gradients (ONE pass over x)
# ----------------------------------------------------------------------

def _make_valgrad_kernel(R, C, Rn, td, D, B, bp, x_is_int: bool,
                         has_pb: bool = False, nu_exp: bool = False,
                         need_value: bool = True):
    base = R + C + 1  # rows: wd | wc | bias2 | wn | bias_n | [pb]
    pbi = base + Rn + 1

    def kernel(x_ref, zc_ref, zn_ref, depth_ref, lse_ref, w_ref,
               nll_ref, gout_ref, rsum_ref, u1_ref, dzn_ref,
               acc_ref, rs_acc, u1_acc, dzn_acc, lg_ref, dg_ref):
        j = pl.program_id(0)
        nj = pl.num_programs(0)

        @pl.when(j == 0)
        def _():
            acc_ref[0, 0] = 0.0
            rs_acc[:] = jnp.zeros_like(rs_acc)
            u1_acc[:] = jnp.zeros_like(u1_acc)
            dzn_acc[:] = jnp.zeros_like(dzn_acc)

        wt = w_ref[:]
        valid = _col_valid(j, td, D, B, bp)
        x = x_ref[:].astype(jnp.float32)
        depth = depth_ref[:]
        h = _compute_h(wt, zc_ref[:], R, C)
        ls = h - lse_ref[:]
        p = jnp.exp(ls)
        if has_pb:
            # post-softmax bias: mu scales by exp(pb); the softmax
            # coupling term (finisher kernel) still uses plain p, so
            # fold exp(pb) into a separate effective probability
            pe = p * jnp.exp(wt[pbi:pbi + 1, :])
        else:
            pe = p
        mu = pe * depth + EPS
        nupre = _compute_nupre(wt, zn_ref, R, C, Rn)
        if nu_exp:
            sp = jnp.exp(nupre)
            sig = None
            nu = jnp.clip(sp, 0.0, NU_HI) + EPS
        else:
            # softplus AND the sigmoid the backward needs share ONE
            # exp(-|z|) (softplus(z) = max(z,0) + log1p(e) bitwise ==
            # jax.nn.softplus; sigmoid via the stable two-branch form):
            # this kernel is VPU-transcendental-bound, so one saved exp
            # per element is real time.  The 1/(1+e) reciprocal is
            # deferred into the shared divide below.
            e = jnp.exp(-jnp.abs(nupre))
            sp = jnp.maximum(nupre, 0.0) + jnp.log1p(e)
            sig = None  # built from the fused reciprocal below
            nu = jnp.clip(sp, NU_LO, NU_HI) + EPS

        # lgamma/digamma differences: exact select-products when all
        # counts in the tile are small integers, the mixed product/
        # Stirling path for all-integer tiles of any magnitude, and the
        # full Stirling-shift path only for non-integer data
        fast = _fast_flag(x, valid, x_is_int) > 0.5
        allint = True if x_is_int else (_int_flag(x, valid) > 0.5)

        @pl.when(fast)
        def _():
            P, dP, _ = _fast_products(x, nu, need_dg=True, need_const=False)
            if need_value:
                lg_ref[:] = -jnp.log(P)
            dg_ref[:] = -dP / P

        @pl.when(jnp.logical_not(fast) & allint)
        def _():
            lg, dg, _ = _mixed_lgdg(x, nu, need_dg=True, need_const=False,
                                    need_lg=need_value)
            if need_value:
                lg_ref[:] = lg
            dg_ref[:] = dg

        if not x_is_int:
            @pl.when(jnp.logical_not(allint))
            def _():
                if need_value:
                    lg_ref[:] = _lgamma_pos(nu) - _lgamma_pos(nu + x)
                dg_ref[:] = _digamma_pos(nu) - _digamma_pos(nu + x)

        # ONE divide serves every reciprocal the gradient needs:
        # 1/(mu+nu), 1/mu and (softplus path) the sigmoid's 1/(1+e) all
        # come from rec = 1/(u*mu*(mu+nu)) with u = 1+e (VPU divides are
        # the costly op here; u <= 2 and mu*(mu+nu) <= ~2e8 keep the
        # product far from f32 overflow).  A few ulp different from the
        # direct divides — inside the golden ELBO band
        # (BASELINE_MEASURED.md).
        mn = mu + nu
        v = mu * mn
        if not nu_exp:
            u = 1.0 + e
            rec = 1.0 / (u * v)
            r = rec * v
            sig = jnp.where(nupre >= 0.0, r, e * r)
            rec = rec * u
        else:
            rec = 1.0 / v
        inv_mn = rec * mu
        inv_mu = rec * mn
        if need_value:
            denom = jnp.log(mn)
            dln = denom - jnp.log(nu)
            terms = (
                lg_ref[:]
                + x * (denom - jnp.log(mu))
                + nu * dln
            )
            acc_ref[0, 0] += jnp.sum(jnp.where(valid, terms, 0.0))
        else:
            # grad-only: log(mu+nu) and log(nu) appear ONLY as their
            # difference — one log of the ratio replaces both
            dln = -jnp.log(nu * inv_mn)

        # t = (x+nu)/(mu+nu) is shared between dmu and dnu (a few-ulp
        # reassociation of dmu vs the x*(...) + nu*(...) split — inside
        # the golden ELBO band, BASELINE_MEASURED.md)
        t = (x + nu) * inv_mn
        dmu = jnp.where(valid, t - x * inv_mu, 0.0)
        dls = dmu * pe * depth
        dnu = dg_ref[:] + t + dln - 1.0
        if nu_exp:
            # nu = clamp(exp(npre), 0, NU_HI): lower clamp never binds
            dnupre = jnp.where(valid & (sp < NU_HI), dnu * sp, 0.0)
        else:
            in_range = (sp > NU_LO) & (sp < NU_HI)
            dnupre = jnp.where(valid & in_range, dnu * sig, 0.0)

        # per-row accumulators (dls/dnupre @ weight-rows ride the MXU).
        # d(nll)/d(depth) = rowsum(dmu*pe) is NOT accumulated here: it
        # equals rowsum(dls)/depth exactly (dls = dmu*pe*depth with a
        # per-row depth), so the caller divides rsum once outside.
        rs_acc[:] += jnp.sum(dls, axis=1, keepdims=True)
        u1_acc[:] += _mm(dls, wt[:R, :], 1, 1)
        dzn_acc[:] += _mm(dnupre, wt[base:base + Rn, :], 1, 1)

        # per-tile weight-gradient rows (stacked like the input rows):
        # the latent contractions are one (R+C, bp) x (bp, td) MXU pass
        gout_ref[:R + C, :] = _mm(zc_ref[:], dls, 0, 0)
        gout_ref[R + C:R + C + 1, :] = jnp.sum(dls, axis=0, keepdims=True)
        gout_ref[base:base + Rn, :] = _mm(zn_ref[:], dnupre, 0, 0)
        gout_ref[base + Rn:base + Rn + 1, :] = jnp.sum(
            dnupre, axis=0, keepdims=True
        )
        if has_pb:
            # d/dpb = colsum(dls): no softmax-coupling subtraction since
            # pb sits outside the log_softmax
            gout_ref[pbi:pbi + 1, :] = jnp.sum(dls, axis=0, keepdims=True)

        @pl.when(j == nj - 1)
        def _():
            nll_ref[0, 0] = acc_ref[0, 0] if need_value else 0.0
            rsum_ref[:] = rs_acc[:]
            u1_ref[:] = u1_acc[:]
            dzn_ref[:] = dzn_acc[:]

    return kernel


def _valgrad_call(x, zm, c, zn, depth, lse, W, *, D, B, has_pb=False,
                  nu_exp=False, need_value=True):
    bp, Dp = x.shape
    td = _tile_for(bp)
    nj = Dp // td
    Tp = W.shape[0]
    R, C, Rn = zm.shape[1], c.shape[1], zn.shape[1]
    x_is_int = jnp.issubdtype(x.dtype, jnp.integer)
    kernel = _make_valgrad_kernel(R, C, Rn, td, D, B, bp, x_is_int,
                                  has_pb, nu_exp, need_value)
    zc = jnp.concatenate([zm, c], axis=1)
    nll, gout, rsum, u1, dzn = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((bp, td), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, R + C), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, Rn), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, td), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((Tp, td), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, R), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, Rn), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, R), jnp.float32),
            jax.ShapeDtypeStruct((bp, Rn), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((bp, 1), jnp.float32),
            pltpu.VMEM((bp, R), jnp.float32),
            pltpu.VMEM((bp, Rn), jnp.float32),
            pltpu.VMEM((bp, td), jnp.float32),
            pltpu.VMEM((bp, td), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x, zc, zn, depth, lse, W)
    return nll[0, 0], gout, rsum, u1, dzn


# ----------------------------------------------------------------------
# kernel 3: finisher — softmax-coupling terms, no x read
# ----------------------------------------------------------------------

def _make_finish_kernel(R, C, td, D):
    def kernel(zc_ref, lse_ref, rsum_ref, w_ref,
               fout_ref, u2_ref, u2_acc):
        j = pl.program_id(0)
        nj = pl.num_programs(0)

        @pl.when(j == 0)
        def _():
            u2_acc[:] = jnp.zeros_like(u2_acc)

        wt = w_ref[:]
        h = _compute_h(wt, zc_ref[:], R, C)
        cols = j * td + jax.lax.broadcasted_iota(jnp.int32, (1, td), 1)
        p = jnp.where(cols < D, jnp.exp(h - lse_ref[:]), 0.0)
        pr = p * rsum_ref[:]
        fout_ref[:R + C, :] = _mm(zc_ref[:], pr, 0, 0)
        u2_acc[:] += _mm(p, wt[:R, :], 1, 1)
        fout_ref[R + C:R + C + 1, :] = jnp.sum(pr, axis=0, keepdims=True)

        @pl.when(j == nj - 1)
        def _():
            u2_ref[:] = u2_acc[:]

    return kernel


def _finish_call(zm, c, lse, rsum, W, *, D):
    bp = zm.shape[0]
    Tp = W.shape[0]
    Dp = W.shape[1]
    td = _tile_for(bp)
    nj = Dp // td
    R, C = zm.shape[1], c.shape[1]
    kernel = _make_finish_kernel(R, C, td, D)
    zc = jnp.concatenate([zm, c], axis=1)
    fout, u2 = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((bp, R + C), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Tp, td), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Tp, td), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, R), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Tp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((bp, R), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bp, R), jnp.float32)],
        interpret=_INTERPRET,
    )(zc, lse, rsum, W)
    return fout, u2


# ----------------------------------------------------------------------
# host-side padding / stacking
# ----------------------------------------------------------------------

def _prep(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n, pb=None):
    B, D = x.shape
    bp = _ceil_to(B, 8)
    Dp = _ceil_to(D, _tile_for(bp))
    R, C, Rn = zm.shape[1], c.shape[1], zn.shape[1]

    def rpad(a):
        return jnp.pad(a, ((0, bp - B), (0, 0))) if bp > B else a

    xp = jnp.pad(x, ((0, bp - B), (0, Dp - D)))
    rows = [wd, wc, bias2.reshape(1, -1), wn, bias_n.reshape(1, -1)]
    if pb is not None:
        rows.append(pb.reshape(1, -1))
    W = jnp.concatenate(rows, axis=0)
    T = W.shape[0]
    Tp = _ceil_to(T, 8)
    W = jnp.pad(W, ((0, Tp - T), (0, Dp - D)))
    return (xp, rpad(zm), rpad(c), rpad(zn), rpad(depth), W,
            dict(B=B, D=D, bp=bp, Dp=Dp, R=R, C=C, Rn=Rn, T=T))


# ----------------------------------------------------------------------
# public ops
# ----------------------------------------------------------------------

def _combine_lse(lse_local, model_axis):
    """Merge per-shard logsumexps over the model axis:
    lse = logsumexp_k(lse_k) for D-sharded logits."""
    m = jax.lax.pmax(lse_local, model_axis)
    s = jax.lax.psum(jnp.exp(lse_local - m), model_axis)
    return m + jnp.log(s)


def nb_step_report(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                   include_const: bool = True, pb=None,
                   nu_exp: bool = False, model_axis: str | None = None):
    """Reporting-pass NLL (value only).  Not differentiable — the
    reporting forward takes no grad step (reference:
    mmvae_alg.hh:277-285).  With ``model_axis`` the D-sized operands are
    shards and the normalizer/NLL combine over the mesh axis (TP)."""
    if not _use_kernel(x.shape[1], x.shape[0]):
        return xla_step_nll(x, zm, c, zn, depth, wd, wc, bias2, wn,
                            bias_n, pb, include_const, nu_exp, model_axis)
    xp, zmp, cp, znp, dpp, W, dims = _prep(
        x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n, pb
    )
    lse = _lse_call(zmp, cp, W, dims["bp"], dims["Dp"],
                    _tile_for(dims["bp"]), dims["D"],
                    dims["R"], dims["C"])
    if model_axis is not None:
        lse = _combine_lse(lse, model_axis)
    nll = _value_call(xp, zmp, cp, znp, dpp, lse, W,
                      D=dims["D"], B=dims["B"], with_const=include_const,
                      has_pb=pb is not None, nu_exp=nu_exp)
    if model_axis is not None:
        nll = jax.lax.psum(nll, model_axis)
    return nll


@jax.custom_vjp
def nb_step_boot(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n):
    """Boot-step NLL with a fused single-pass VJP.

    Differentiable in (zm, zn, depth, wd, wc, bias2, wn, bias_n); x and
    c are data."""
    nll, _ = _boot_fwd(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n)
    return nll


def _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n, pb,
                   nu_exp: bool, model_axis: str | None = None,
                   need_value: bool = True):
    """Shared fused fwd+grad.  Returns (nll, (res, xla_vjp)) where res
    additionally carries d_pb when ``pb`` is given.

    With ``model_axis`` (TP): D-sized operands are shards; the softmax
    normalizer, the scalar NLL, and every per-ROW reduction (rsum, u1,
    u2, dzn, ddepth — reductions over D) are psum-combined over the
    axis, while per-COLUMN weight gradients stay shard-local — the
    TPU-native layout for a feature-sharded decoder (SURVEY §5.7,
    nb.hh:433-442 at atlas-scale D)."""
    if not _use_kernel(x.shape[1], x.shape[0]):
        args = [jnp.asarray(x, jnp.float32), zm, c, zn, depth, wd, wc,
                bias2, wn, bias_n]
        if pb is not None:
            args.append(pb)
        nll, vjp = jax.vjp(
            lambda *a: xla_step_nll(*a, include_const=False,
                                    nu_exp=nu_exp, model_axis=model_axis),
            *args,
        )
        return nll, (None, vjp)

    xp, zmp, cp, znp, dpp, W, dims = _prep(
        x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n, pb
    )
    B, D, R, C, Rn = (dims["B"], dims["D"], dims["R"], dims["C"],
                      dims["Rn"])
    lse = _lse_call(zmp, cp, W, dims["bp"], dims["Dp"],
                    _tile_for(dims["bp"]), D, R, C)
    if model_axis is not None:
        lse = _combine_lse(lse, model_axis)
    nll, gout, rsum, u1, dzn = _valgrad_call(
        xp, zmp, cp, znp, dpp, lse, W, D=D, B=B, has_pb=pb is not None,
        nu_exp=nu_exp, need_value=need_value,
    )
    if model_axis is not None:
        if need_value:
            nll = jax.lax.psum(nll, model_axis)
        rsum = jax.lax.psum(rsum, model_axis)  # global before the finisher
        u1 = jax.lax.psum(u1, model_axis)
        dzn = jax.lax.psum(dzn, model_axis)
    # d(nll)/d(depth) = rowsum(dmu*pe) == rowsum(dls)/depth exactly
    # (per-row depth factors out of the row sum); the kernel no longer
    # accumulates it.  depth == 0 -> rsum == 0 and the true cotangent is
    # annihilated by softplus' sigmoid upstream: guard the 0/0 only.
    # PRECONDITION: depth >= 0 (it is a softplus/row-sum product at every
    # call site); a negative depth would need the exact rowsum(dmu*pe)
    # instead, so zero the undefined branch rather than clamping it.
    dd = jnp.where(dpp > 0, rsum / jnp.maximum(dpp, 1e-30), 0.0)
    fout, u2 = _finish_call(zmp, cp, lse, rsum, W, D=D)
    if model_axis is not None:
        u2 = jax.lax.psum(u2, model_axis)

    # dh = dls - p * rowsum(dls): gout holds the dls contractions, fout
    # the p*rowsum ones; rows are stacked [wd | wc | bias2 | ...]
    gw = gout[:R + C + 1, :D] - fout[:R + C + 1, :D]
    d_wd = gw[:R]
    d_wc = gw[R:R + C]
    d_bias2 = gw[R + C]
    d_wn = gout[R + C + 1:R + C + 1 + Rn, :D]
    d_bias_n = gout[R + C + 1 + Rn, :D]
    d_zm = (u1 - rsum * u2)[:B]
    res = [d_zm, dzn[:B], dd[:B], d_wd, d_wc, d_bias2, d_wn, d_bias_n]
    if pb is not None:
        res.append(gout[R + C + 2 + Rn, :D])
    return nll, (tuple(res), None)


def _boot_fwd(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n):
    return _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                          None, nu_exp=False)


def _boot_bwd(saved, g):
    res, xla_vjp = saved
    if res is None:
        dx, dzm, dc, dzn, ddep, dwd, dwc, db2, dwn, dbn = xla_vjp(g)
        return (None, dzm, None, dzn, ddep, dwd, dwc, db2, dwn, dbn)
    d_zm, d_zn, d_dep, d_wd, d_wc, d_bias2, d_wn, d_bias_n = res
    g = jnp.asarray(g, jnp.float32)
    return (
        None,
        g * d_zm,
        None,
        g * d_zn,
        g * d_dep,
        g * d_wd,
        g * d_wc,
        g * d_bias2,
        g * d_wn,
        g * d_bias_n,
    )


nb_step_boot.defvjp(_boot_fwd, _boot_bwd)


@jax.custom_vjp
def nb_step_boot_joint(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n, pb):
    """Boot-step NLL for the joint/mixture NB half: ``pb`` is the
    post-softmax log-bias (mu_bias OUTSIDE log_softmax, vmfnb.hh:466)
    and the overdispersion decode is ``clamp(exp(.), 0, NU_HI)``
    (vmfnb.hh:488-493).  Differentiable in everything but x and c."""
    nll, _ = _boot_joint_fwd(x, zm, c, zn, depth, wd, wc, bias2, wn,
                             bias_n, pb)
    return nll


def _boot_joint_fwd(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n, pb):
    return _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                          pb, nu_exp=True)


def _boot_joint_bwd(saved, g):
    res, xla_vjp = saved
    if res is None:
        (dx, dzm, dc, dzn, ddep, dwd, dwc, db2, dwn, dbn,
         dpb) = xla_vjp(g)
        return (None, dzm, None, dzn, ddep, dwd, dwc, db2, dwn, dbn, dpb)
    (d_zm, d_zn, d_dep, d_wd, d_wc, d_bias2, d_wn, d_bias_n,
     d_pb) = res
    g = jnp.asarray(g, jnp.float32)
    return (
        None,
        g * d_zm,
        None,
        g * d_zn,
        g * d_dep,
        g * d_wd,
        g * d_wc,
        g * d_bias2,
        g * d_wn,
        g * d_bias_n,
        g * d_pb,
    )


nb_step_boot_joint.defvjp(_boot_joint_fwd, _boot_joint_bwd)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def nb_step_boot_tp(model_axis, x, zm, c, zn, depth, wd, wc, bias2, wn,
                    bias_n):
    """TP variant of :func:`nb_step_boot`: runs inside a ``shard_map``
    whose ``model_axis`` shards the feature dimension D.  Weight
    gradients stay shard-local; row reductions psum over the axis."""
    nll, _ = _boot_tp_fwd(model_axis, x, zm, c, zn, depth, wd, wc, bias2,
                          wn, bias_n)
    return nll


def _boot_tp_fwd(model_axis, x, zm, c, zn, depth, wd, wc, bias2, wn,
                 bias_n):
    return _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                          None, nu_exp=False, model_axis=model_axis)


# ----------------------------------------------------------------------
# grad-only boot variants: the production boot step consumes ONLY
# gradients (train.loop._batch_step and ops.nb_fast take jax.grad of the
# boot loss and discard its value, matching the reference's backprop-only
# bootstrap pass, mmvae_alg.hh:290-311).  These skip every VPU op that
# exists solely for the primal — the lgamma differences and the
# x*(log(mu+nu)-log(mu)) value terms — and return 0.0 as the primal.
# Their VJP is IDENTICAL to the value-bearing ops.  Never use them where
# the loss value itself is read.
# ----------------------------------------------------------------------

@jax.custom_vjp
def nb_step_boot_gradonly(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n):
    """:func:`nb_step_boot` minus the primal: returns 0.0, same VJP."""
    nll, _ = _boot_gradonly_fwd(x, zm, c, zn, depth, wd, wc, bias2, wn,
                                bias_n)
    return nll


def _boot_gradonly_fwd(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n):
    return _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                          None, nu_exp=False, need_value=False)


nb_step_boot_gradonly.defvjp(_boot_gradonly_fwd, _boot_bwd)


@jax.custom_vjp
def nb_step_boot_joint_gradonly(x, zm, c, zn, depth, wd, wc, bias2, wn,
                                bias_n, pb):
    """:func:`nb_step_boot_joint` minus the primal: 0.0, same VJP."""
    nll, _ = _boot_joint_gradonly_fwd(x, zm, c, zn, depth, wd, wc, bias2,
                                      wn, bias_n, pb)
    return nll


def _boot_joint_gradonly_fwd(x, zm, c, zn, depth, wd, wc, bias2, wn,
                             bias_n, pb):
    return _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                          pb, nu_exp=True, need_value=False)


nb_step_boot_joint_gradonly.defvjp(_boot_joint_gradonly_fwd,
                                   _boot_joint_bwd)


def _boot_tp_bwd(model_axis, saved, g):
    res, xla_vjp = saved
    if res is None:
        # XLA fallback: autodiff produced SHARD-LOCAL row cotangents
        # (each shard differentiates only its local-D loss terms).  The
        # TP contract — matching the kernel path, and required by the
        # identity-gradient encoder psums upstream — is REPLICATED
        # (globally summed) row cotangents, so psum them here.  Weight
        # gradients are per-column and stay local.
        dx, dzm, dc, dzn, ddep, dwd, dwc, db2, dwn, dbn = xla_vjp(g)
        dzm = jax.lax.psum(dzm, model_axis)
        dzn = jax.lax.psum(dzn, model_axis)
        ddep = jax.lax.psum(ddep, model_axis)
        return (None, dzm, None, dzn, ddep, dwd, dwc, db2, dwn, dbn)
    return _boot_bwd(saved, g)


nb_step_boot_tp.defvjp(_boot_tp_fwd, _boot_tp_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def nb_step_boot_tp_gradonly(model_axis, x, zm, c, zn, depth, wd, wc,
                             bias2, wn, bias_n):
    """:func:`nb_step_boot_tp` minus the primal: 0.0, same VJP."""
    nll, _ = _boot_tp_gradonly_fwd(model_axis, x, zm, c, zn, depth, wd,
                                   wc, bias2, wn, bias_n)
    return nll


def _boot_tp_gradonly_fwd(model_axis, x, zm, c, zn, depth, wd, wc, bias2,
                          wn, bias_n):
    return _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                          None, nu_exp=False, model_axis=model_axis,
                          need_value=False)


nb_step_boot_tp_gradonly.defvjp(_boot_tp_gradonly_fwd, _boot_tp_bwd)


# ----------------------------------------------------------------------
# TP variants of the JOINT boot step (vmfnb / vmfnb_mixture NB half):
# same feature-sharded contract as nb_step_boot_tp — D-sized operands
# (incl. the post-softmax log-bias pb) are 'model' shards, the softmax
# normalizer and per-row reductions psum over the axis, weight/pb
# gradients stay shard-local (SURVEY §5.7; vmfnb_mixture.hh:482-560 at
# atlas-scale D).
# ----------------------------------------------------------------------

@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def nb_step_boot_joint_tp(model_axis, x, zm, c, zn, depth, wd, wc, bias2,
                          wn, bias_n, pb):
    """TP variant of :func:`nb_step_boot_joint`."""
    nll, _ = _boot_joint_tp_fwd(model_axis, x, zm, c, zn, depth, wd, wc,
                                bias2, wn, bias_n, pb)
    return nll


def _boot_joint_tp_fwd(model_axis, x, zm, c, zn, depth, wd, wc, bias2,
                       wn, bias_n, pb):
    return _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                          pb, nu_exp=True, model_axis=model_axis)


def _boot_joint_tp_bwd(model_axis, saved, g):
    res, xla_vjp = saved
    if res is None:
        # XLA fallback: psum the shard-local row cotangents to the
        # replicated contract (see _boot_tp_bwd)
        (dx, dzm, dc, dzn, ddep, dwd, dwc, db2, dwn, dbn,
         dpb) = xla_vjp(g)
        dzm = jax.lax.psum(dzm, model_axis)
        dzn = jax.lax.psum(dzn, model_axis)
        ddep = jax.lax.psum(ddep, model_axis)
        return (None, dzm, None, dzn, ddep, dwd, dwc, db2, dwn, dbn, dpb)
    return _boot_joint_bwd(saved, g)


nb_step_boot_joint_tp.defvjp(_boot_joint_tp_fwd, _boot_joint_tp_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def nb_step_boot_joint_tp_gradonly(model_axis, x, zm, c, zn, depth, wd,
                                   wc, bias2, wn, bias_n, pb):
    """:func:`nb_step_boot_joint_tp` minus the primal: 0.0, same VJP."""
    nll, _ = _boot_joint_tp_gradonly_fwd(model_axis, x, zm, c, zn, depth,
                                         wd, wc, bias2, wn, bias_n, pb)
    return nll


def _boot_joint_tp_gradonly_fwd(model_axis, x, zm, c, zn, depth, wd, wc,
                                bias2, wn, bias_n, pb):
    return _boot_fwd_impl(x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n,
                          pb, nu_exp=True, model_axis=model_axis,
                          need_value=False)


nb_step_boot_joint_tp_gradonly.defvjp(_boot_joint_tp_gradonly_fwd,
                                      _boot_joint_tp_bwd)
