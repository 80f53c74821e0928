"""Multi-host sharded input: per-host slices assemble to the full batch."""

import numpy as np

import jax

from mmvae_tpu.parallel.multihost import (
    HostShardedLoader,
    global_batch_array,
    host_slice,
)
from mmvae_tpu.parallel.mesh import make_mesh


def test_host_slice_partition():
    batch = np.arange(32)
    parts = [host_slice(batch, h, 4) for h in range(4)]
    assert np.array_equal(np.concatenate(parts), batch)
    assert all(len(p) == 8 for p in parts)


def test_sharded_loader_union_equals_global(mtx_file):
    path, idx, dens = mtx_file
    H, B = 4, 24
    loaders = [HostShardedLoader(path, idx, B, h, H) for h in range(H)]
    batches = loaders[0].batches()
    assert all(np.array_equal(b1, b2) for b1, b2 in zip(
        batches, loaders[1].batches()))  # identical schedule on all hosts
    for gb in batches[:3]:
        rows = [ld.read_local(gb).copy() for ld in loaders]
        full = np.concatenate(rows, axis=0)
        assert np.array_equal(full, dens[:, gb].T)


def test_global_batch_array_single_process(mtx_file):
    """On one process make_array_from_process_local_data distributes the
    host-local rows over the mesh's data axis."""
    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    path, idx, dens = mtx_file
    mesh = make_mesh()
    ld = HostShardedLoader(path, idx, 16, 0, 1)
    gb = ld.batches()[0]
    local = ld.read_local(gb)
    arr = global_batch_array(mesh, local)
    assert arr.shape == (16, dens.shape[0])
    np.testing.assert_array_equal(np.asarray(arr), dens[:, gb].T)
