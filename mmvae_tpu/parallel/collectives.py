"""Collectives with explicit gradient semantics for shard_map bodies.

Under ``shard_map(..., check_vma=False)`` (required around Pallas
kernels), JAX cannot track which values are replicated, so the
transpose of ``psum`` conservatively re-psums the cotangent — doubling
(x axis size) every gradient that flows through a forward psum.  For
the TP pattern used here — *partial* values psum'd into a *replicated*
activation whose cotangent is replicated — the correct transpose is the
identity.  ``psum_id_grad`` encodes that contract.
"""

from __future__ import annotations

import jax


def psum_id_grad(x, axis_name: str):
    """``lax.psum`` whose backward pass is the identity.

    Correct when the consumer treats the result as replicated over
    ``axis_name`` (so its cotangent is replicated too) — the standard
    tensor-parallel partial-sum reduction."""

    @jax.custom_vjp
    def f(v):
        return jax.lax.psum(v, axis_name)

    def fwd(v):
        return jax.lax.psum(v, axis_name), None

    def bwd(_, g):
        return (g,)

    f.defvjp(fwd, bwd)
    return f(x)


def psum_grad(x, axis_name: str):
    """Identity forward; ``lax.psum`` backward.

    Marks a REPLICATED activation entering SHARD-LOCAL compute (e.g. a
    latent feeding a column-sharded decoder matmul).  The consumers'
    per-shard cotangents are *partial* — each shard sees only its local
    loss terms' contribution — so the true (global) cotangent is their
    psum.  This is the raw-autodiff analog of the explicit row-cotangent
    psums inside the fused kernels' custom VJPs (ops/nb_step.py
    _boot_fwd_impl)."""

    @jax.custom_vjp
    def f(v):
        return v

    def fwd(v):
        return v, None

    def bwd(_, g):
        return (jax.lax.psum(g, axis_name),)

    f.defvjp(fwd, bwd)
    return f(x)


def tp_l2_normalize(x, axis_name: str, axis: int = -1,
                    differentiated: bool = True):
    """L2 normalization over an axis that is SHARDED over ``axis_name``:
    local partial square-sums are psum'd into the global norm.  Eps
    semantics identical to ``ops.losses.l2_normalize`` (F::normalize,
    p=2, eps=1e-12).

    The norm psum keeps its PLAIN (summing) transpose: the replicated
    total feeds the shard-local normalized outputs, so per-shard
    cotangents of the total are partial and must accumulate across
    shards (the same contract as the softmax-normalizer psum in
    ops/nb_step.xla_step_nll).  ``differentiated`` is accepted for
    call-site documentation only — the correct collective is identical
    either way."""
    import jax.numpy as jnp

    del differentiated
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    tot = jax.lax.psum(sq, axis_name)
    return x / jnp.maximum(jnp.sqrt(tot), 1e-12)
