"""Multi-host distributed input + initialization.

The reference is strictly single-process (SURVEY §2.7).  The TPU-native
scaling story for its workload:

- ``jax.distributed.initialize`` once per host (:func:`init_multihost`);
- one global mesh over all devices; the batch axis is sharded over
  ``data`` (which spans hosts x local devices);
- **sharded input**: each host reads only its slice of every global
  batch directly from the shared bgzipped .mtx — the column index makes
  any subset of columns independently seekable
  (reference: include/mmutil_index.hh:192-228), so hosts need no
  coordination beyond the deterministic batch schedule;
- the per-host (B/H, D) slices assemble into one global jax.Array via
  ``jax.make_array_from_process_local_data``.

Everything here is functional and testable on a single host by
constructing multiple :class:`HostShardedLoader` instances.
"""

from __future__ import annotations

import numpy as np

import jax

from ..data.pipeline import sequential_batches


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when single-process).

    The init timeout is bounded (MMVAE_DIST_TIMEOUT, default 120 s
    instead of jax's 300 s) so a peer that never comes up fails fast
    enough for a supervisor — or the test suite's retry wrapper — to
    relaunch the job instead of hanging past its own deadline."""
    if num_processes is None or num_processes <= 1:
        return
    import os

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=int(
            os.environ.get("MMVAE_DIST_TIMEOUT", "120")
        ),
    )


def host_slice(batch: np.ndarray, host_id: int, host_count: int) -> np.ndarray:
    """This host's contiguous slice of a global batch's column ids.

    The global batch is split evenly over hosts in order, matching a
    batch axis sharded over a (hosts x local devices) 'data' mesh axis.
    """
    B = len(batch)
    assert B % host_count == 0, (
        f"global batch {B} not divisible by {host_count} hosts"
    )
    bh = B // host_count
    return batch[host_id * bh: (host_id + 1) * bh]


def sharded_batches(ntot: int, global_batch: int, host_id: int,
                    host_count: int) -> list[np.ndarray]:
    """This host's slices of the global deterministic schedule.

    Every slice is a contiguous column range of its global batch, so
    per-host reads coalesce into one BGZF seek (reference:
    find_consecutive_blocks, mmvae_io.hh:150-204).  Used by
    ``train_vae_model(host_count=...)``; per-host blocks are ordinary
    :class:`~mmvae_tpu.data.MtxDataBlock`/``MtxMemoryBlock`` instances
    with batch size ``global_batch // host_count``.
    """
    return [host_slice(gb, host_id, host_count)
            for gb in sequential_batches(ntot, global_batch)]


def global_batch_array(sharding, local_rows: np.ndarray):
    """Assemble per-host local rows into one global jax.Array with the
    given (batch-sharded) sharding.  Used by ``Trainer._put`` for every
    multi-host input transfer."""
    return jax.make_array_from_process_local_data(sharding, local_rows)


def local_rows(arr, axis: int = 1) -> np.ndarray:
    """This host's contiguous rows of a globally sharded array.

    Inverse of :func:`global_batch_array` for OUTPUTS: a multi-host
    recording epoch returns posteriors sharded over ``axis`` (the batch
    axis); each host fetches only its addressable shards — which cover a
    contiguous slice matching its :func:`sharded_batches` schedule — and
    ingests them into its local recorder (the cross-host merge happens
    in ``LatentRecorder._merged``)."""
    arr = jax.numpy.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[axis].start or 0)
    # replicated mesh axes (e.g. TP's 'model' for batch-sharded record
    # outputs) surface the same block once per replica device — keep one
    # shard per distinct FULL index (so genuinely-2-D-sharded inputs,
    # which this helper does not support, fail the width check below
    # instead of being silently truncated)
    seen, uniq = set(), []
    for s in shards:
        key = tuple((sl.start, sl.stop) for sl in s.index)
        if key in seen:
            continue
        seen.add(key)
        uniq.append(s)
    out = np.concatenate([np.asarray(s.data) for s in uniq], axis=axis)
    assert all(out.shape[i] == arr.shape[i]
               for i in range(out.ndim) if i != axis), (
        f"local_rows expects sharding along axis {axis} only; "
        f"got shard shape {out.shape} vs global {arr.shape}"
    )
    return out
