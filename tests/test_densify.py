"""On-device densify vs the host data blocks."""

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.data import MtxMemoryBlock
from mmvae_tpu.ops.densify import DeviceCSC


def test_densify_matches_host_block(mtx_file, rng):
    path, idx, dens = mtx_file
    B = 12
    mb = MtxMemoryBlock(path, idx, B)
    csc = DeviceCSC.from_memory_block(mb)
    for _ in range(3):
        cols = rng.integers(0, dens.shape[1], size=B)
        got = np.asarray(csc.densify(jnp.asarray(cols)))
        assert np.array_equal(got, dens[:, cols].T)


def test_densify_duplicates_and_jit(mtx_file):
    path, idx, dens = mtx_file
    mb = MtxMemoryBlock(path, idx, 5)
    csc = DeviceCSC.from_memory_block(mb)
    cols = jnp.asarray([3, 3, 0, 119, 3])
    f = jax.jit(csc.densify)
    got = np.asarray(f(cols))
    assert np.array_equal(got, dens[:, np.asarray(cols)].T)
