"""Device mesh + sharding layout.

This layer has no analog in the reference, which is single-process,
single-device (SURVEY §2.7).  Scaling here is the idiomatic JAX way:
one ``jax.sharding.Mesh`` over the slice's devices with two logical
axes —

- ``data``:   batch dimension (DP).  Per-batch losses sum over the
  batch, so sharding the batch makes XLA insert the gradient
  ``psum`` over ICI automatically; no hand-written collectives.
- ``model``:  the feature dimension D (TP).  For atlas-scale D the
  decoder/encoder matmuls and their (*, D) parameters shard over this
  axis; the log_softmax over D becomes an XLA all-reduce pair.

Use :func:`make_mesh` for a 1-D data mesh (the default) or pass
``model_parallel`` for a 2-D (data, model) mesh.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    """Mesh over all local devices: (data, model) with |model| =
    ``model_parallel``."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    assert n % model_parallel == 0, (
        f"{n} devices not divisible by model_parallel={model_parallel}"
    )
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (S, B, ...) superbatches: shard B over 'data'."""
    return NamedSharding(mesh, P(None, "data", None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tree_pspecs(tree, data_dim: int):
    """PartitionSpec pytree for shard_map in/out_specs: shard every
    axis of size ``data_dim`` (the feature axis D) over 'model',
    replicate everything else.  Applies uniformly to parameter trees
    and to optimizer states (whose moment leaves mirror the params)."""

    def spec_for(arr):
        shape = np.shape(arr)
        spec = [None] * len(shape)
        for i, s in enumerate(shape):
            if s == data_dim and data_dim > 1:
                spec[i] = "model"
                break  # shard at most one axis
        return P(*spec)

    return jax.tree_util.tree_map(spec_for, tree)


def feature_sharded_pspecs(params, row=(), col=(), flat=(),
                           overrides=None):
    """Name-convention TP PartitionSpecs over the 'model' (feature D)
    mesh axis — the shared body of every model's ``tp_pspecs``.

    - ``row``: module names whose (D, H) weight shards ROWS —
      ``P('model', None)`` weight, replicated bias (Angular first
      layers carry no bias at all).
    - ``col``: module names whose (H, D) weight shards COLUMNS —
      ``P(None, 'model')`` weight, ``P('model')`` bias.
    - ``flat``: names of bare (1, D) leaves — ``P(None, 'model')``.
    - ``overrides``: ``name -> PartitionSpec``, checked first (the
      mixture's (D, K) ``ln_vmf_mu`` row shard).

    Everything else is replicated.  Being name-keyed (the dict keys
    double as the reference's artifact names), hidden widths equal to
    D cannot be mis-sharded — unlike the size heuristic of
    :func:`tree_pspecs`."""
    row, col, flat = set(row), set(col), set(flat)
    overrides = overrides or {}

    def spec_for(name, val):
        if name in overrides:
            return overrides[name]
        if name in flat:
            return P(None, "model")
        if name in row:
            return {k: (P("model", None) if k == "weight" else P())
                    for k in val}
        if name in col:
            return {k: (P(None, "model") if k == "weight"
                        else P("model")) for k in val}
        return jax.tree_util.tree_map(lambda _: P(), val)

    return {k: spec_for(k, v) for k, v in params.items()}


def named_tree_pspecs(tree, param_specs):
    """Propagate NAME-AWARE parameter PartitionSpecs onto an arbitrary
    pytree whose leaves mirror the parameter dict by trailing dict path
    (the params themselves, optimizer moment trees, gradient trees).

    ``param_specs`` is the model's ``tp_pspecs(params)`` tree (same
    structure as params, ``PartitionSpec`` leaves).  Each leaf of
    ``tree`` is matched by the longest suffix of its dict-key path that
    names a parameter; unmatched leaves (e.g. the Adam step counter)
    are replicated.  This replaces the size-match heuristic of
    :func:`tree_pspecs`, which mis-shards hidden widths equal to the
    feature dim D."""
    from jax.tree_util import DictKey

    is_p = lambda s: isinstance(s, P)
    full = {}
    for path, spec in jax.tree_util.tree_leaves_with_path(
        param_specs, is_leaf=is_p
    ):
        names = tuple(k.key for k in path if isinstance(k, DictKey))
        full[names] = spec

    def for_leaf(path, leaf):
        names = tuple(k.key for k in path if isinstance(k, DictKey))
        for i in range(len(names)):
            spec = full.get(names[i:])
            if spec is not None and len(spec) == np.ndim(leaf):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(for_leaf, tree)


def param_sharding(mesh: Mesh, params: dict, data_dim: int) -> dict:
    """Tensor-parallel layout: shard every parameter axis of size
    ``data_dim`` (the feature axis D) over 'model'; replicate the rest.

    Returns a pytree of NamedSharding matching ``params`` (the
    NamedSharding view of :func:`tree_pspecs` — one rule, two forms).
    """
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        tree_pspecs(params, data_dim),
        is_leaf=lambda s: isinstance(s, P),
    )
