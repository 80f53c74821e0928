"""Shared building blocks: torch-parity Linear stacks and the Angular layer.

Models are plain pytrees of parameters plus pure apply functions — the
idiomatic JAX shape for code that must run under ``jit`` / ``pjit`` /
``shard_map`` and inside ``lax.scan`` training loops.  Parameter dicts
are keyed with the reference's ``named_parameters`` names so the
artifact recorder can dump an identical file set (SURVEY §2.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.initializers import linear_apply, torch_linear_init
from ..ops.losses import l2_normalize


def angular_init(key: jax.Array, d_in: int, d_out: int) -> dict:
    """Angular layer parameters: an unnormalized weight, no bias.

    Reference: ``AngularImpl`` (include/modules/angular.hh:44-70) —
    kaiming-uniform(a=sqrt(5)) weight, bias registered but undefined.
    """
    return torch_linear_init(key, d_in, d_out, with_bias=False)


def angular_apply(params: dict, x: jax.Array) -> jax.Array:
    """Direction-only linear layer: rows of the weight are ReLU'd then
    L2-normalized before the matmul (include/modules/angular.hh:34-42).

    The weight is stored (d_in, d_out); the reference normalizes each
    *output unit's* weight vector, which lives along axis 0 here.
    """
    eps = 1e-4
    ww = l2_normalize(jax.nn.relu(params["weight"]) + eps, axis=0)
    return x @ ww


def init_linear_stack(
    key: jax.Array,
    prefix: str,
    d_in: int,
    hidden: list[int],
    d_final: int | None,
    angular: bool = False,
) -> tuple[dict, list[str], int]:
    """Initialize an encoder/decoder stack following the reference's
    layer-construction recipe (include/models/nb.hh:324-379):

    - one Linear per hidden dim, named ``{prefix}_1..{prefix}_k``;
    - if ``d_final`` is not None and there are no hidden layers, a single
      Linear ``{prefix}`` mapping d_in -> d_final (encoder quirk);
    - if ``d_final`` is not None and used as a decoder final map, callers
      pass hidden plus a final layer named ``{prefix}``.

    Returns (params, ordered layer names, output dim of the stack).
    """
    params: dict = {}
    names: list[str] = []
    d_prev = d_in
    keys = jax.random.split(key, len(hidden) + 1)
    init = angular_init if angular else torch_linear_init
    for i, d_next in enumerate(hidden):
        name = f"{prefix}_{i + 1}"
        params[name] = init(keys[i], d_prev, d_next)
        names.append(name)
        d_prev = d_next
    if d_final is not None:
        params[prefix] = init(keys[-1], d_prev, d_final)
        names.append(prefix)
        d_prev = d_final
    return params, names, d_prev


def apply_stack(
    params: dict,
    names: list[str],
    x: jax.Array,
    do_relu: bool,
    relu_last: bool,
    angular: bool = False,
) -> jax.Array:
    """Apply a named Linear/Angular stack with optional inter-layer ReLU.

    ``relu_last`` distinguishes encoder stacks (ReLU after every layer
    when --relu, nb.hh:332-349) from decoder stacks (no ReLU after the
    final reconstruction map, nb.hh:368-379).
    """
    apply = angular_apply if angular else linear_apply
    h = x
    for i, name in enumerate(names):
        h = apply(params[name], h)
        if do_relu and (relu_last or i + 1 < len(names)):
            h = jax.nn.relu(h)
    return h


def reparameterize(
    key: jax.Array, mean: jax.Array, lnvar: jax.Array, training: bool
) -> jax.Array:
    """Gaussian reparameterization; eval mode returns the mean
    (reference: include/models/nb.hh:462-472)."""
    if not training:
        return mean
    sig = jnp.exp(lnvar / 2.0)
    eps = jax.random.normal(key, lnvar.shape, lnvar.dtype)
    return mean + eps * sig
