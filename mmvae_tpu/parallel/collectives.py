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
