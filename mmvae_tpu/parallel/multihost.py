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

from ..data.block import MtxDataBlock
from ..data.pipeline import sequential_batches


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
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


class HostShardedLoader:
    """Per-host reader producing this host's slice of each global batch.

    With the sequential wrap-around schedule each host's slice is a
    contiguous column range, so reads coalesce into one BGZF seek
    per batch (reference: find_consecutive_blocks, mmvae_io.hh:150-204).
    """

    def __init__(self, mtx_file: str, idx_file: str, global_batch: int,
                 host_id: int, host_count: int):
        assert global_batch % host_count == 0
        self.host_id = host_id
        self.host_count = host_count
        self.local_batch = global_batch // host_count
        self.global_batch = global_batch
        self.block = MtxDataBlock(mtx_file, idx_file, self.local_batch)

    def ntot(self) -> int:
        return self.block.ntot()

    def nfeature(self) -> int:
        return self.block.nfeature()

    def batches(self) -> list[np.ndarray]:
        """The *global* deterministic schedule (identical on all hosts)."""
        return sequential_batches(self.block.ntot(), self.global_batch)

    def read_local(self, global_batch_cols: np.ndarray) -> np.ndarray:
        """(B/H, D) rows for this host's slice of the global batch."""
        cols = host_slice(global_batch_cols, self.host_id, self.host_count)
        self.block.clear()
        return self.block.read(cols)


def global_batch_array(mesh, local_rows: np.ndarray):
    """Assemble per-host (B/H, D) rows into a global (B, D) jax.Array
    sharded over the mesh's 'data' axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data", None))
    return jax.make_array_from_process_local_data(sharding, local_rows)
