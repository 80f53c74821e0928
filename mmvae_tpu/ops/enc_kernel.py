"""Fused count-encoder contraction kernels.

The packed fast steps (ops/nb_fast.py, ops/vmfnb_fast.py) feed every
(B, D) encoder contraction from two derived views of the integer count
matrix — ``L = log1p(x)`` and ``xf = float(x)`` (reference encoders:
include/models/nb.hh:312-349, 403-431, 444-451; vmfnb.hh:449-486,
598-611).  Under XLA each bootstrap step re-materializes both views for
its resampled rows and the dots (plus their weight-gradient backward)
re-read them: ~36 MB of HBM traffic per boot at the reference config —
which profiling shows is most of the step's non-Pallas time.

This module fuses view construction into the contraction: the forward
kernel reads the (B, D) int16 counts ONCE per call, computes ``L``/
``xf`` in-register, and accumulates

    hL = L  @ WL^T        (B, r1)     [log1p-view rows]
    hX = xf @ WX^T        (B, r2)     [raw-count rows]
    stats = [sum(L), sum(L^2), sum(L*f), sum(L^2*f)]   (optional)

tile by tile on the MXU; the backward recomputes the views from the
same counts and produces the stacked weight-gradient rows
``dWL = g1^T @ L``, ``dWX = g2^T @ xf`` without ever materializing a
(B, D) float tensor.  The ``stats`` rows serve the vMF models' row
normalizers (parameter-independent -> no gradient); ``f`` is the
mixture's annotation filter mask.

Matmul precision matches the fast steps' ``_data_mm`` exactly: DEFAULT
TPU precision rounds both operands to bf16 and accumulates f32, which
is what the bf16-stored views produced.  Accumulation ORDER across D
tiles differs from one whole-array XLA dot, so results differ by
reassociation ulps on TPU only — the CPU path uses the plain-XLA
fallback below and stays bitwise identical to the pre-kernel code.

Zero-padding does all the masking: padded count columns/rows are zero,
``log1p(0) == 0``, and zero-padded weight rows contribute nothing to
any dot or stat — the kernels carry no masks at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU

_TD = 1024


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _use_kernel(D: int) -> bool:
    if _INTERPRET:
        return True
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return D >= 512


def _mm(a, b, ca: int, cb: int):
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


# ----------------------------------------------------------------------
# XLA fallback — also the semantic spec (bitwise = the pre-kernel path)
# ----------------------------------------------------------------------

def _xla_encode(x, WL, WX, filt, want_stats: bool):
    # mirrors ops.nb_fast._encoder_views + _data_mm exactly (bitwise):
    # bf16-stored views + bf16 dots on TPU, plain f32 on CPU
    from .nb_fast import _data_mm, _encoder_views

    L, xf = _encoder_views(x)
    hL = _data_mm(L, WL)
    hX = _data_mm(xf, WX)
    if not want_stats:
        return hL, hX, None
    # stats in f32 BEFORE the bf16 rounding (matches _views in
    # ops/vmfnb_fast.py, which computes row norms on the f32 log1p)
    Lf32 = jnp.log1p(x.astype(jnp.float32))
    s = jnp.sum(Lf32, axis=1)
    ssq = jnp.sum(Lf32 * Lf32, axis=1)
    if filt is not None:
        Lm = Lf32 * filt
        sf = jnp.sum(Lm, axis=1)
        ssqf = jnp.sum(Lm * Lf32, axis=1)
    else:
        sf = s
        ssqf = ssq
    return hL, hX, jnp.stack([s, ssq, sf, ssqf], axis=1)


# ----------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------

def _make_fwd_kernel(r1p: int, r2p: int, want_stats: bool,
                     has_filt: bool):
    def kernel(*refs):
        if has_filt:
            (x_ref, w_ref, f_ref, hl_ref, hx_ref, st_ref,
             hl_acc, hx_acc, st_acc) = refs
        elif want_stats:
            (x_ref, w_ref, hl_ref, hx_ref, st_ref,
             hl_acc, hx_acc, st_acc) = refs
            f_ref = None
        else:
            x_ref, w_ref, hl_ref, hx_ref, hl_acc, hx_acc = refs
            f_ref = st_ref = st_acc = None
        j = pl.program_id(0)
        nj = pl.num_programs(0)

        @pl.when(j == 0)
        def _():
            hl_acc[:] = jnp.zeros_like(hl_acc)
            hx_acc[:] = jnp.zeros_like(hx_acc)
            if want_stats:
                st_acc[:] = jnp.zeros_like(st_acc)

        xf = x_ref[:].astype(jnp.float32)
        L = jnp.log1p(xf)
        wt = w_ref[:]
        hl_acc[:] += _mm(L, wt[:r1p, :], 1, 1)
        hx_acc[:] += _mm(xf, wt[r1p:, :], 1, 1)
        if want_stats:
            L2 = L * L
            s = jnp.sum(L, axis=1, keepdims=True)
            ssq = jnp.sum(L2, axis=1, keepdims=True)
            if has_filt:
                f = f_ref[:]
                sf = jnp.sum(L * f, axis=1, keepdims=True)
                ssqf = jnp.sum(L2 * f, axis=1, keepdims=True)
            else:
                sf, ssqf = s, ssq
            st_acc[:] += jnp.concatenate([s, ssq, sf, ssqf], axis=1)

        @pl.when(j == nj - 1)
        def _():
            hl_ref[:] = hl_acc[:]
            hx_ref[:] = hx_acc[:]
            if want_stats:
                st_ref[:] = st_acc[:]

    return kernel


def _fwd_call(xp, W, filt_p, r1p: int, r2p: int, want_stats: bool):
    bp, Dp = xp.shape
    td = min(_TD, Dp)
    nj = Dp // td
    has_filt = filt_p is not None
    kernel = _make_fwd_kernel(r1p, r2p, want_stats, has_filt)
    in_specs = [
        pl.BlockSpec((bp, td), lambda j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((r1p + r2p, td), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [xp, W]
    if has_filt:
        in_specs.append(pl.BlockSpec((1, td), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(filt_p)
    b_spec = lambda w: pl.BlockSpec((bp, w), lambda j: (0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    out_specs = [b_spec(r1p), b_spec(r2p)]
    out_shape = [jax.ShapeDtypeStruct((bp, r1p), jnp.float32),
                 jax.ShapeDtypeStruct((bp, r2p), jnp.float32)]
    scratch = [pltpu.VMEM((bp, r1p), jnp.float32),
               pltpu.VMEM((bp, r2p), jnp.float32)]
    if want_stats:
        out_specs.append(b_spec(4))
        out_shape.append(jax.ShapeDtypeStruct((bp, 4), jnp.float32))
        scratch.append(pltpu.VMEM((bp, 4), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=_INTERPRET,
    )(*inputs)
    return outs if want_stats else (*outs, None)


# ----------------------------------------------------------------------
# backward kernel: stacked weight-gradient rows, no (B, D) intermediate
# ----------------------------------------------------------------------

def _make_bwd_kernel(r1p: int):
    def kernel(x_ref, g1_ref, g2_ref, dw_ref):
        xf = x_ref[:].astype(jnp.float32)
        L = jnp.log1p(xf)
        dw_ref[:r1p, :] = _mm(g1_ref[:], L, 0, 0)
        dw_ref[r1p:, :] = _mm(g2_ref[:], xf, 0, 0)

    return kernel


def _bwd_call(xp, g1, g2, r1p: int, r2p: int):
    bp, Dp = xp.shape
    td = min(_TD, Dp)
    nj = Dp // td
    kernel = _make_bwd_kernel(r1p)
    b_spec = lambda w: pl.BlockSpec((bp, w), lambda j: (0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    dw = pl.pallas_call(
        kernel,
        grid=(nj,),
        in_specs=[
            pl.BlockSpec((bp, td), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            b_spec(r1p), b_spec(r2p),
        ],
        out_specs=pl.BlockSpec((r1p + r2p, td), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r1p + r2p, Dp), jnp.float32),
        interpret=_INTERPRET,
    )(xp, g1, g2)
    return dw


# ----------------------------------------------------------------------
# public op
# ----------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def count_encode(x, WL, WX, filt, want_stats: bool = False):
    """Fused ``(log1p(x) @ WL^T, x @ WX^T[, row stats])``.

    x     : (B, D) integer (or float) counts — data, no gradient
    WL    : (r1, D) rows contracted against log1p(x) — OR a tuple of
            row blocks, concatenated inside the op (callers with
            several L-side parameter groups avoid materializing the
            stacked matrix twice: the op pads-and-concatenates anyway)
    WX    : (r2, D) rows contracted against float(x)
    filt  : optional (1, D) mask for the filtered stats (mixture)
    want_stats (static): also return (B, 4) f32
            ``[sum L, sum L^2, sum L*filt, sum L^2*filt]``
            (parameter-independent — carries no gradient)

    Returns (hL, hX, stats_or_None); ``hL`` columns follow the WL block
    order.  Semantics (and the CPU path) match the fast steps'
    bf16-view ``_data_mm`` contractions bitwise; on TPU the tiled f32
    accumulation differs by reassociation ulps.
    """
    out, _ = _ce_fwd(x, WL, WX, filt, want_stats)
    return out


def _wl_parts(WL):
    return WL if isinstance(WL, tuple) else (WL,)


def _ce_fwd(x, WL, WX, filt, want_stats):
    assert filt is None or want_stats, "filt only affects the stats"
    B, D = x.shape
    parts = _wl_parts(WL)
    if not _use_kernel(D):
        out, vjp = jax.vjp(
            lambda wl, wx: _xla_encode(
                x, jnp.concatenate(wl, axis=0) if len(wl) > 1 else wl[0],
                wx, filt, want_stats),
            parts, WX,
        )
        return out, (None, vjp, isinstance(WL, tuple))
    r1 = sum(p.shape[0] for p in parts)
    r2 = WX.shape[0]
    r1p, r2p = _ceil_to(max(r1, 1), 8), _ceil_to(max(r2, 1), 8)
    bp = _ceil_to(B, 8)
    td = min(_TD, _ceil_to(D, 128))
    Dp = _ceil_to(D, td)
    xp = jnp.pad(x, ((0, bp - B), (0, Dp - D)))
    # ONE concatenate builds the padded stack directly from the blocks
    W = jnp.concatenate(
        [jnp.pad(p, ((0, 0), (0, Dp - D))) for p in parts]
        + ([jnp.zeros((r1p - r1, Dp), parts[0].dtype)] if r1p > r1
           else [])
        + [jnp.pad(WX, ((0, r2p - r2), (0, Dp - D)))],
        axis=0,
    )
    filt_p = (jnp.pad(filt, ((0, 0), (0, Dp - D)))
              if filt is not None else None)
    hL, hX, st = _fwd_call(xp, W, filt_p, r1p, r2p, want_stats)
    out = (hL[:B, :r1], hX[:B, :r2],
           st[:B] if want_stats else None)
    part_rows = tuple(p.shape[0] for p in parts)
    return out, ((xp, B, D, r1, r2, r1p, r2p, part_rows,
                  isinstance(WL, tuple)), None, None)


def _ce_bwd(want_stats, res, g):
    saved, xla_vjp, was_tuple = res
    g1, g2, _gst = g
    if saved is None:
        dparts, dWX = xla_vjp((g1, g2, _gst))
        dWL = dparts if was_tuple else dparts[0]
        return None, dWL, dWX, None
    (xp, B, D, r1, r2, r1p, r2p, part_rows, was_tuple) = saved
    bp = xp.shape[0]
    g1p = jnp.pad(jnp.asarray(g1, jnp.float32),
                  ((0, bp - B), (0, r1p - r1)))
    g2p = jnp.pad(jnp.asarray(g2, jnp.float32),
                  ((0, bp - B), (0, r2p - r2)))
    dw = _bwd_call(xp, g1p, g2p, r1p, r2p)
    if was_tuple:
        dWL, off = [], 0
        for n in part_rows:
            dWL.append(dw[off:off + n, :D])
            off += n
        dWL = tuple(dWL)
    else:
        dWL = dw[:r1, :D]
    return None, dWL, dw[r1p:r1p + r2, :D], None


count_encode.defvjp(_ce_fwd, _ce_bwd)
