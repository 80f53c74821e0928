"""Shared CLI scaffolding: index auto-build, covariate auto-creation.

Mirrors the setup phase of both reference mains
(src/nb_vae_main.cc:51-82, src/vmf_vae_main.cc:52-83).
"""

from __future__ import annotations

import argparse
import os

# Honor JAX_PLATFORMS=cpu even where the ambient TPU plugin overrides the
# env var (it does in this image): apply it programmatically before any
# backend initialization.  Other values (e.g. the plugin's own name) are
# left to the plugin's native selection.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - already initialized
        pass

from ..data.block import MtxDataBlock, create_ones_like
from ..io.index import build_mmutil_index
from ..train.config import MMVaeOptions, TrainingOptions
from ..utils.logging import TLOG


def compose_parsers(description: str, model_group) -> argparse.ArgumentParser:
    """One argparse parser carrying all three option groups (the
    reference's composable-parsers scheme, SURVEY §2.5)."""
    p = argparse.ArgumentParser(
        description=description,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    MMVaeOptions.add_args(p)
    TrainingOptions.add_args(p)
    g = p.add_argument_group("model")
    model_group(g)
    return p


def add_relu_flags(g) -> None:
    g.add_argument("--relu", dest="do_relu", action="store_true",
                   default=False)
    g.add_argument("--no_relu", "--no-relu", dest="do_relu",
                   action="store_false")


def prepare_blocks(opts: MMVaeOptions) -> tuple[MtxDataBlock, MtxDataBlock]:
    """Build indexes as needed and construct the data + covariate blocks
    (reference: src/nb_vae_main.cc:58-82)."""
    if not os.path.exists(opts.idx):
        build_mmutil_index(opts.mtx, opts.idx)

    data_block = MtxDataBlock(opts.mtx, opts.idx, opts.batch_size)

    covar_mtx = opts.covar_mtx
    covar_idx = opts.covar_idx
    if not covar_mtx or not os.path.exists(covar_mtx):
        covar_mtx = opts.out + ".covar.mtx.gz"
        covar_idx = covar_mtx + ".index"
        create_ones_like(data_block, covar_mtx)
        TLOG("No covariate file is given. So we use this:", covar_mtx)
        if os.path.exists(covar_idx):
            os.remove(covar_idx)
        build_mmutil_index(covar_mtx, covar_idx)
    elif not os.path.exists(covar_idx):
        build_mmutil_index(covar_mtx, covar_idx)

    covar_block = MtxDataBlock(covar_mtx, covar_idx, opts.batch_size)
    return data_block, covar_block
