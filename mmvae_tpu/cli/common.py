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

from ..data.block import MtxDataBlock, MtxMemoryBlock, create_ones_like
from ..io.index import build_mmutil_index
from ..io.mtx import peek_mtx_header
from ..train.config import MMVaeOptions, TrainingOptions
from ..utils.logging import TLOG

# auto data-mode threshold: hold the CSC arrays in host RAM when the
# estimated footprint stays below this (overridable via env)
_INMEM_BYTES = int(os.environ.get("MMVAE_INMEM_BYTES", 4 << 30))


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


def _pick_block_type(opts: MMVaeOptions):
    """Streaming vs in-memory data block (``--data_mode``).

    ``auto`` (default) loads the matrix into host CSC arrays when the
    estimated footprint fits ``MMVAE_INMEM_BYTES`` (4 GB default) —
    batches then come from RAM instead of per-batch BGZF seeks, which
    matters on hosts with few cores.  Batch contents are identical
    either way (the block-equivalence property is tested), so
    trajectories do not depend on the mode.  ``stream`` forces the
    reference's out-of-core behavior (mmvae_io.hh); ``memory`` forces
    the in-memory path (mmvae_mem.hh).
    """
    mode = getattr(opts, "data_mode", "auto")
    if mode == "stream":
        return MtxDataBlock
    if mode == "memory":
        return MtxMemoryBlock
    hdr = peek_mtx_header(opts.mtx)
    est = hdr.nnz * 8 + (hdr.cols + 1) * 8
    if est <= _INMEM_BYTES:
        TLOG(f"Data fits in memory (~{est / 1e6:,.0f} MB) — "
             "using the in-memory block (--data_mode stream to override)")
        return MtxMemoryBlock
    return MtxDataBlock


def prepare_blocks(opts: MMVaeOptions) -> tuple[MtxDataBlock, MtxDataBlock]:
    """Build indexes as needed and construct the data + covariate blocks
    (reference: src/nb_vae_main.cc:58-82)."""
    if not os.path.exists(opts.idx):
        build_mmutil_index(opts.mtx, opts.idx)

    block_type = _pick_block_type(opts)
    if block_type is MtxMemoryBlock:
        # narrow integer batch buffers when lossless: the (B, D) batch
        # transfer dominates host->device time at large D
        data_block = block_type(opts.mtx, opts.idx, opts.batch_size,
                                count_dtype="auto")
    else:
        data_block = block_type(opts.mtx, opts.idx, opts.batch_size)

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

    covar_block = block_type(covar_mtx, covar_idx, opts.batch_size)
    return data_block, covar_block
