"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-native analog of "multi-node tests without a cluster":
`xla_force_host_platform_device_count=8` lets the sharding/collective
paths (mmvae_tpu.parallel) compile and execute on one host.
"""

import os

# force CPU regardless of ambient JAX_PLATFORMS (the driver presets e.g.
# "axon" for the real TPU; tests must be deterministic and keep the chip
# free).  NOTE: in this environment the env var alone is overridden by the
# TPU plugin — the programmatic config update below is what actually wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


def make_count_matrix(rng, D, N, rate=0.8, ensure_nonempty_cols=True):
    """Random sparse count matrix as column-sorted triplets + dense ref."""
    dens = rng.poisson(rate, size=(D, N)).astype(np.float32)
    if ensure_nonempty_cols:
        empty = ~(dens > 0).any(axis=0)
        dens[0, empty] = 1.0
    rr, cc = np.nonzero(dens)
    vv = dens[rr, cc]
    order = np.lexsort((rr, cc))
    return rr[order], cc[order], vv[order], dens


@pytest.fixture()
def mtx_file(tmp_path, rng):
    """A small indexed bgzipped mtx file; returns (path, idx_path, dense)."""
    from mmvae_tpu.io.writers import write_matrix_market_file
    from mmvae_tpu.io.index import build_mmutil_index

    D, N = 40, 120
    rr, cc, vv, dens = make_count_matrix(rng, D, N)
    path = str(tmp_path / "data.mtx.gz")
    write_matrix_market_file(path, rr, cc, vv, (D, N))
    idx = build_mmutil_index(path)
    return path, idx, dens
