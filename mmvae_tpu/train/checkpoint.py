"""Checkpoint / resume (a capability the reference lacks — SURVEY §5.4).

The reference only dumps parameters as gzipped text with no load path
(write-only snapshots, include/models/nb.hh:583-616).  Here a checkpoint
holds everything needed for exact resume: parameters, Adam state, the
epoch counter, and the training seed.  Storage is a single ``.npz``
(flattened pytree) plus a JSON sidecar — no external dependencies, safe
under preemption via atomic rename.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import numpy as np


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        items = tree.items()
        for k, v in items:
            flat.update(_flatten(v, f"{prefix}{k}/"))
        return flat
    if isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
        return flat
    flat[prefix.rstrip("/")] = np.asarray(tree)
    return flat


def save_checkpoint(
    ckpt_dir: str,
    params,
    opt_state,
    epoch: int,
    seed: int,
    loss_vec: list[float],
) -> str:
    """Atomically write ``<ckpt_dir>/ckpt.npz`` + ``meta.json``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    flat_p = {f"params/{k}": v for k, v in _flatten(params).items()}

    # Optimizer state: serialize leaves keyed by their full tree path
    # (chain index + state field + param name) so a structurally
    # different optimizer cannot silently absorb the wrong moments.
    opt_paths, opt_treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    flat_o = {
        f"opt/{jax.tree_util.keystr(p)}": np.asarray(l) for p, l in opt_paths
    }

    meta = {
        "epoch": epoch,
        "seed": seed,
        "loss_vec": [float(v) for v in loss_vec],
        "opt_treedef": str(opt_treedef),
        "n_opt_leaves": len(opt_paths),
    }

    path = os.path.join(ckpt_dir, "ckpt.npz")
    # The metadata rides INSIDE the npz so the checkpoint is one atomic
    # rename — a crash between two file renames could otherwise pair
    # epoch-N arrays with epoch-(N-1) metadata and silently replay an
    # epoch on resume.
    meta_arr = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    # note: np.savez appends ".npz" unless the name already ends with it
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp.npz")
    os.close(fd)
    np.savez(tmp, __meta__=meta_arr, **flat_p, **flat_o)
    os.replace(tmp, path)

    # human-readable convenience copy (never read back when the npz
    # carries __meta__)
    mpath = os.path.join(ckpt_dir, "meta.json")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".json.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, mpath)
    return path


def load_checkpoint(ckpt_dir: str, params_template, opt_state_template=None):
    """Restore (params, opt_state, next_epoch, loss_vec).

    Templates provide the pytree structure (build them with
    ``model.init`` + ``optimizer.init`` before calling).
    ``opt_state_template=None`` skips optimizer-state reconstruction
    (returned as None) — for params-only consumers like post-hoc
    encoding, which must load checkpoints from ANY optimizer
    configuration (e.g. the clipless tensor-parallel chain).
    """
    data = np.load(os.path.join(ckpt_dir, "ckpt.npz"))
    if "__meta__" in data.files:
        meta = json.loads(bytes(data["__meta__"]).decode())
    else:  # legacy round-1 checkpoints: sidecar json
        with open(os.path.join(ckpt_dir, "meta.json")) as f:
            meta = json.load(f)

    flat_t = _flatten(params_template)
    params_flat = {}
    for k in flat_t:
        arr = data[f"params/{k}"]
        if arr.shape != flat_t[k].shape:
            raise ValueError(
                f"checkpoint shape mismatch for {k}: "
                f"{arr.shape} vs {flat_t[k].shape}"
            )
        params_flat[k] = arr
    params = _unflatten_like(params_template, params_flat)

    if opt_state_template is None:
        return params, None, meta["epoch"] + 1, list(meta["loss_vec"])

    paths_t, treedef = jax.tree_util.tree_flatten_with_path(opt_state_template)
    if meta["n_opt_leaves"] != len(paths_t):
        raise ValueError("optimizer state structure changed; cannot resume")
    want = [f"opt/{jax.tree_util.keystr(p)}" for p, _ in paths_t]
    stored = {k for k in data.files if k.startswith("opt/")}
    if stored == set(want):
        opt_leaves = []
        for key, (_, leaf_t) in zip(want, paths_t):
            arr = data[key]
            if arr.shape != np.shape(leaf_t):
                raise ValueError(
                    f"checkpoint shape mismatch for {key}: "
                    f"{arr.shape} vs {np.shape(leaf_t)}"
                )
            opt_leaves.append(arr)
    elif stored == {f"opt/{i}" for i in range(len(paths_t))}:
        # legacy round-1 positional checkpoints (pre named-key guard)
        opt_leaves = [data[f"opt/{i}"] for i in range(len(paths_t))]
    else:
        raise ValueError(
            "optimizer state structure changed; cannot resume "
            f"(missing: {sorted(set(want) - stored)[:3]}, "
            f"unexpected: {sorted(stored - set(want))[:3]})"
        )
    opt_state = jax.tree_util.tree_unflatten(treedef, opt_leaves)

    return params, opt_state, meta["epoch"] + 1, list(meta["loss_vec"])


def _unflatten_like(template, flat: dict, prefix=""):
    if isinstance(template, dict):
        return {
            k: _unflatten_like(v, flat, f"{prefix}{k}/")
            for k, v in template.items()
        }
    if isinstance(template, (list, tuple)):
        seq = [
            _unflatten_like(v, flat, f"{prefix}{i}/")
            for i, v in enumerate(template)
        ]
        if hasattr(template, "_fields"):  # namedtuple: positional fields
            return type(template)(*seq)
        return type(template)(seq)
    return flat[prefix.rstrip("/")]
