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


def test_ensure_row_major_passthrough():
    from mmvae_tpu.ops.densify import ensure_row_major

    # host arrays pass through untouched
    host = np.arange(12).reshape(3, 4)
    assert ensure_row_major(host) is host

    # device arrays come back row-major with identical contents
    dev = jnp.arange(12, dtype=jnp.int16).reshape(3, 4)
    out = ensure_row_major(dev)
    assert np.array_equal(np.asarray(out), np.asarray(dev))
    lay = out.format.layout
    assert lay is None or tuple(lay.major_to_minor) == (0, 1)

    # a column-major array is relaid out, not just returned
    cm = jnp.asarray(np.asfortranarray(np.arange(12.0).reshape(3, 4)))
    out2 = ensure_row_major(cm)
    assert np.array_equal(np.asarray(out2), np.arange(12.0).reshape(3, 4))
