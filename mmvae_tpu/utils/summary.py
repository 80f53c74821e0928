"""Model summary printed at train start.

Reference parity: LibTorch's ``model->pretty_print(std::cerr)`` dumps
the module tree to stderr right before training (mmvae_alg.hh:238).
The equivalent here is the model dataclass's static configuration plus
the parameter dict with shapes — the same information a reference user
reads off the module tree (layer names, in/out dims), in artifact-name
form.
"""

from __future__ import annotations

import sys

import numpy as np


def pretty_print(model, params: dict, file=None) -> None:
    """Write a torch-style module summary to ``file`` (default stderr).

    One line per parameter group: ``name: weight (in, out) | bias (n,)``
    for layer dicts, ``name: (shape)`` for bare arrays.  Total trainable
    parameter count on the closing line.
    """
    out = file if file is not None else sys.stderr
    cfg = []
    for k, v in vars(model).items() if not hasattr(model, "__dataclass_fields__") else (
        (f.name, getattr(model, f.name))
        for f in model.__dataclass_fields__.values()
    ):
        shape = getattr(v, "shape", None)
        if shape is not None and len(shape) > 0:
            # any array-valued config field (np OR jax, any rank):
            # summarize by shape — never dump contents to stderr
            cfg.append(f"{k}=<{'x'.join(str(s) for s in shape)} array>")
        else:
            cfg.append(f"{k}={v}")
    out.write(f"{type(model).__name__}({', '.join(cfg)})\n")

    total = 0
    for name in sorted(params):
        val = params[name]
        if isinstance(val, dict):
            parts = []
            order = [s for s in ("weight", "bias") if s in val]
            order += [s for s in sorted(val) if s not in ("weight", "bias")]
            for sub in order:
                shape = tuple(np.shape(val[sub]))
                total += int(np.prod(shape))
                parts.append(f"{sub} {shape}")
            out.write(f"  ({name}): {' | '.join(parts)}\n")
        else:
            shape = tuple(np.shape(val))
            total += int(np.prod(shape))
            out.write(f"  ({name}): {shape}\n")
    out.write(f"  [{total:,} parameters]\n")
    out.flush()
