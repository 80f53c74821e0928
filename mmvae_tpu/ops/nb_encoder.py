"""Fused Pallas kernel for the NB-VAE encoder front end (EXPERIMENTAL).

After the ELBO kernel (ops/nb_elbo.py) the remaining (B, D) traffic in a
gradient step is the encoder side: the learned input standardization
``xn = (log1p(x) - x_mean) / (softplus(ln_x_sd) + 1e-4)``
(reference: include/models/nb.hh:403-417) feeding the mu encoder's first
linear, plus the raw-x matmuls of the overdispersion encoder and the
depth head (nb.hh:388, 400).  XLA evaluates these as separate passes
over x; this kernel computes all three projections in ONE pass per
direction:

    h_mu = xn @ w_mu          (B, R)
    h_x  = x  @ w_x           (B, M)   [w_x = concat(nu_enc, depth)]

with a custom VJP whose backward is also a single pass producing
``dw_mu, dw_x, d(x_mean), d(ln_x_sd)`` (x itself is data — no gradient).

STATUS: correct (tested), but NOT wired into the default path — on v5e
it measured *slower* than XLA's schedule for this block (the tiny R=2 /
M=2 output dims leave the MXU idle while the per-tile accumulator
read-modify-write dominates), and the MXU's default bf16 multiply
precision perturbs the weight-gradient contraction.  Revisit with
precision=HIGHEST and wider fused output panels (e.g. folding the
repr-mean/lnvar heads in) before enabling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-4

_INTERPRET = False


def _tile_d(D: int) -> int:
    if D < 512:
        return 0
    return 512


def _pad_rows(arr, bp):
    B = arr.shape[0]
    if bp == B:
        return arr
    return jnp.pad(arr, ((0, bp - B), (0, 0)))


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------

def _make_fwd(B, D, td, bp):
    def kernel(x_ref, xm_ref, ls_ref, wmu_ref, wx_ref,
               hmu_ref, hx_ref, acc_mu, acc_x):
        j = pl.program_id(0)
        nj = pl.num_programs(0)

        @pl.when(j == 0)
        def _():
            acc_mu[:] = jnp.zeros_like(acc_mu)
            acc_x[:] = jnp.zeros_like(acc_x)

        cols = j * td + jax.lax.broadcasted_iota(jnp.int32, (1, td), 1)
        valid = cols < D
        # mask the partial last tile everywhere: OOB reads are undefined
        # and 0 * garbage could be NaN.  (iota'd directly as (td,1):
        # Mosaic cannot reshape a (1,td) mask across the minor dim)
        rows_valid = (
            j * td + jax.lax.broadcasted_iota(jnp.int32, (td, 1), 0)
        ) < D

        x = jnp.where(valid, x_ref[:], 0.0)
        sd = jax.nn.softplus(ls_ref[:])
        xn = (jnp.log1p(x) - xm_ref[:]) / (sd + EPS)
        xn = jnp.where(valid, xn, 0.0)
        wmu = jnp.where(rows_valid, wmu_ref[:], 0.0)
        wx = jnp.where(rows_valid, wx_ref[:], 0.0)

        acc_mu[:] += jnp.dot(xn, wmu, preferred_element_type=jnp.float32)
        acc_x[:] += jnp.dot(x, wx, preferred_element_type=jnp.float32)

        @pl.when(j == nj - 1)
        def _():
            hmu_ref[:] = acc_mu[:]
            hx_ref[:] = acc_x[:]

    return kernel


def _fwd_call(x, xm, ls, wmu, wx, td):
    B, D = x.shape
    R = wmu.shape[1]
    M = wx.shape[1]
    bp = -(-B // 8) * 8
    xp = _pad_rows(x, bp)
    grid = (pl.cdiv(D, td),)
    bd = pl.BlockSpec((bp, td), lambda j: (0, j), memory_space=pltpu.VMEM)
    d1 = pl.BlockSpec((1, td), lambda j: (0, j), memory_space=pltpu.VMEM)
    wmu_s = pl.BlockSpec((td, R), lambda j: (j, 0), memory_space=pltpu.VMEM)
    wx_s = pl.BlockSpec((td, M), lambda j: (j, 0), memory_space=pltpu.VMEM)
    out_mu = pl.BlockSpec((bp, R), lambda j: (0, 0), memory_space=pltpu.VMEM)
    out_x = pl.BlockSpec((bp, M), lambda j: (0, 0), memory_space=pltpu.VMEM)
    hmu, hx = pl.pallas_call(
        _make_fwd(B, D, td, bp),
        grid=grid,
        in_specs=[bd, d1, d1, wmu_s, wx_s],
        out_specs=(out_mu, out_x),
        out_shape=(
            jax.ShapeDtypeStruct((bp, R), jnp.float32),
            jax.ShapeDtypeStruct((bp, M), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bp, R), jnp.float32),
            pltpu.VMEM((bp, M), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(xp, xm, ls, wmu, wx)
    return hmu[:B], hx[:B], xp


# ----------------------------------------------------------------------
# backward: one pass, producing dw_mu, dw_x, d(x_mean), d(ln_x_sd)
# ----------------------------------------------------------------------

def _make_bwd(B, D, td, bp):
    def kernel(x_ref, xm_ref, ls_ref, wmu_ref, dhmu_ref, dhx_ref,
               dwmu_ref, dwx_ref, dxm_ref, dls_ref):
        j = pl.program_id(0)
        cols = j * td + jax.lax.broadcasted_iota(jnp.int32, (1, td), 1)
        valid = cols < D
        x = jnp.where(valid, x_ref[:], 0.0)
        ls = jnp.where(valid, ls_ref[:], 0.0)
        xm = jnp.where(valid, xm_ref[:], 0.0)
        sd = jax.nn.softplus(ls)
        inv = 1.0 / (sd + EPS)
        xn = (jnp.log1p(x) - xm) * inv

        # weight grads: contract over the (zero-padded) batch rows
        dwmu_ref[:] = jax.lax.dot_general(
            xn, dhmu_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwx_ref[:] = jax.lax.dot_general(
            x, dhx_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # standardization grads (pad rows of dh are zero => dxn rows zero)
        rows_valid = (
            j * td + jax.lax.broadcasted_iota(jnp.int32, (td, 1), 0)
        ) < D
        wmu = jnp.where(rows_valid, wmu_ref[:], 0.0)
        dxn = jax.lax.dot_general(
            dhmu_ref[:], wmu, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sum_dxn = jnp.sum(dxn, axis=0, keepdims=True)
        dxm_ref[:] = -sum_dxn * inv
        sum_dxn_xn = jnp.sum(dxn * xn, axis=0, keepdims=True)
        dls_ref[:] = -sum_dxn_xn * inv * jax.nn.sigmoid(ls)

    return kernel


def _bwd_call(xp, xm, ls, wmu, dhmu, dhx, td, B):
    bp, D = xp.shape
    R = wmu.shape[1]
    M = dhx.shape[1]
    dhmu = _pad_rows(dhmu, bp)
    dhx = _pad_rows(dhx, bp)
    grid = (pl.cdiv(D, td),)
    bd = pl.BlockSpec((bp, td), lambda j: (0, j), memory_space=pltpu.VMEM)
    d1 = pl.BlockSpec((1, td), lambda j: (0, j), memory_space=pltpu.VMEM)
    wmu_s = pl.BlockSpec((td, R), lambda j: (j, 0), memory_space=pltpu.VMEM)
    small_mu = pl.BlockSpec((bp, R), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)
    small_x = pl.BlockSpec((bp, M), lambda j: (0, 0), memory_space=pltpu.VMEM)
    dwmu, dwx, dxm, dls = pl.pallas_call(
        _make_bwd(B, D, td, bp),
        grid=grid,
        in_specs=[bd, d1, d1, wmu_s, small_mu, small_x],
        out_specs=(
            wmu_s,
            pl.BlockSpec((td, M), lambda j: (j, 0), memory_space=pltpu.VMEM),
            d1, d1,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, R), jnp.float32),
            jax.ShapeDtypeStruct((D, M), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(xp, xm, ls, wmu, dhmu, dhx)
    return dwmu, dwx, dxm, dls


# ----------------------------------------------------------------------
# public op
# ----------------------------------------------------------------------

def _reference_impl(x, xm, ls, wmu, wx):
    sd = jax.nn.softplus(ls)
    xn = (jnp.log1p(x) - xm) / (sd + EPS)
    return xn @ wmu, x @ wx


@jax.custom_vjp
def nb_encoder_fused(x, xm, ls, wmu, wx):
    """One-pass standardize + triple projection (see module docstring)."""
    td = _tile_d(x.shape[1])
    if td == 0:
        return _reference_impl(x, xm, ls, wmu, wx)
    hmu, hx, _ = _fwd_call(x, xm, ls, wmu, wx, td)
    return hmu, hx


def _vjp_fwd(x, xm, ls, wmu, wx):
    td = _tile_d(x.shape[1])
    if td == 0:
        out, vjp = jax.vjp(_reference_impl, x, xm, ls, wmu, wx)
        return out, (None, vjp)
    hmu, hx, xp = _fwd_call(x, xm, ls, wmu, wx, td)
    return (hmu, hx), ((xp, xm, ls, wmu, x.shape[0]), None)


def _vjp_bwd(res, g):
    saved, xla_vjp = res
    dhmu, dhx = g
    if saved is None:
        return xla_vjp((dhmu, dhx))
    xp, xm, ls, wmu, B = saved
    td = _tile_d(xp.shape[1])
    dwmu, dwx, dxm, dls = _bwd_call(xp, xm, ls, wmu, dhmu, dhx, td, B)
    return None, dxm, dls, dwmu, dwx


nb_encoder_fused.defvjp(_vjp_fwd, _vjp_bwd)
