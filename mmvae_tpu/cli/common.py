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

# Persistent compilation cache: first compiles through remote-device
# tunnels cost minutes; repeat CLI invocations should not re-pay them.
# Opt out with MMVAE_JAX_CACHE=off.
_cache_dir = os.environ.get(
    "MMVAE_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "mmvae_tpu", "jax"),
)
if _cache_dir and _cache_dir.lower() != "off":
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover
        pass

from ..data.block import MtxDataBlock, MtxMemoryBlock, create_ones_like
from ..io.index import build_mmutil_index
from ..io.mtx import peek_mtx_header
from ..train.config import MMVaeOptions, TrainingOptions
from ..utils.logging import TLOG, WLOG

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


def warn_unknown_args(unknown) -> None:
    """Warn (stderr) about command-line flags no option group claims.

    The reference's composable parsers each silently skip the other
    groups' flags — but ``compose_parsers`` merges every group into ONE
    parser, so anything left over here is a genuine typo (e.g.
    ``--epochs`` for ``--epoch``) that would otherwise silently train
    with defaults.  Kept a warning, not an error, to preserve the
    reference's tolerant parsing contract."""
    if unknown:
        WLOG("ignoring unrecognized arguments:", " ".join(unknown))


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


def multihost_setup(opts: MMVaeOptions, topt: TrainingOptions):
    """(local_batch | None, kwargs for ``train_vae_model``).

    Multi-host runs (--num_hosts > 1, after ``apply_runtime_config``
    initialized jax.distributed) read B/num_hosts rows per host and
    train data-parallel over the global mesh."""
    if topt.num_hosts <= 1:
        return None, {}
    if opts.batch_size % topt.num_hosts:
        raise ValueError(
            f"--batch_size {opts.batch_size} not divisible by "
            f"--num_hosts {topt.num_hosts}"
        )
    return (opts.batch_size // topt.num_hosts,
            dict(host_count=topt.num_hosts, host_id=topt.host_id))


def host_role() -> tuple[bool, bool]:
    """(multihost, is_primary) for the current process."""
    import jax

    n = jax.process_count()
    return n > 1, (n <= 1 or jax.process_index() == 0)


def prepare_blocks(
    opts: MMVaeOptions, local_batch: int | None = None
) -> tuple[MtxDataBlock, MtxDataBlock]:
    """Build indexes as needed and construct the data + covariate blocks
    (reference: src/nb_vae_main.cc:58-82).

    ``local_batch`` overrides the block batch size (multi-host: each
    host reads B/num_hosts rows of every global batch).  In multi-host
    runs only process 0 creates sidecar files; the others wait at a
    barrier and then read them.
    """
    B = local_batch if local_batch is not None else opts.batch_size
    multihost, primary = host_role()

    if primary and not os.path.exists(opts.idx):
        build_mmutil_index(opts.mtx, opts.idx)
    if multihost:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mmvae:index")

    block_type = _pick_block_type(opts)
    if block_type is MtxMemoryBlock:
        # narrow integer batch buffers when lossless: the (B, D) batch
        # transfer dominates host->device time at large D
        data_block = block_type(opts.mtx, opts.idx, B, count_dtype="auto")
    else:
        data_block = block_type(opts.mtx, opts.idx, B)

    covar_mtx = opts.covar_mtx
    covar_idx = opts.covar_idx
    auto_covar = not covar_mtx or not os.path.exists(covar_mtx)
    if auto_covar:
        covar_mtx = opts.out + ".covar.mtx.gz"
        covar_idx = covar_mtx + ".index"
        if primary:
            create_ones_like(data_block, covar_mtx)
            TLOG("No covariate file is given. So we use this:", covar_mtx)
            if os.path.exists(covar_idx):
                os.remove(covar_idx)
            build_mmutil_index(covar_mtx, covar_idx)
    elif primary and not os.path.exists(covar_idx):
        build_mmutil_index(covar_mtx, covar_idx)
    if multihost:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mmvae:covar")

    covar_block = block_type(covar_mtx, covar_idx, B)
    if auto_covar:
        # explicit signal for the on-device fast path: this covariate
        # is the generated constant, not user data (train.loop relies
        # on this flag, never on content probing)
        covar_block.auto_ones = True
    return data_block, covar_block
