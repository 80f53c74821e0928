"""Parameter initialization matching LibTorch's defaults.

Matching the reference's ELBO trajectories (BASELINE.md) requires the
same initial parameter *distribution* as ``torch::nn::Linear``:
kaiming-uniform(a=sqrt(5)) on the weight, which reduces to
U(-1/sqrt(fan_in), +1/sqrt(fan_in)), and the same bound on the bias
(reference relies on LibTorch defaults; the Angular module spells the
identical scheme out at include/modules/angular.hh:59-70).

Weights are stored (fan_in, fan_out) — the natural layout for ``x @ W``
on the MXU.  The artifact recorder transposes on write so the dumped
text matrices keep the reference's (out, in) orientation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_linear_init(
    key: jax.Array,
    d_in: int,
    d_out: int,
    with_bias: bool = True,
    dtype=jnp.float32,
) -> dict:
    """{'weight': (d_in, d_out), 'bias': (d_out,)} with LibTorch init."""
    bound = 1.0 / math.sqrt(d_in)
    wkey, bkey = jax.random.split(key)
    params = {
        "weight": jax.random.uniform(
            wkey, (d_in, d_out), dtype, minval=-bound, maxval=bound
        )
    }
    if with_bias:
        params["bias"] = jax.random.uniform(
            bkey, (d_out,), dtype, minval=-bound, maxval=bound
        )
    return params


def linear_apply(params: dict, x: jax.Array) -> jax.Array:
    y = x @ params["weight"]
    if "bias" in params:
        y = y + params["bias"]
    return y
