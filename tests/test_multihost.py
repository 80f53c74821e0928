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


def test_two_process_cli_end_to_end(mtx_file, tmp_path):
    """REAL multi-host: two OS processes with jax.distributed over a
    shared CPU mesh, per-host sharded BGZF input, cross-host recorder
    merge — trajectories and artifacts bitwise-equal to single-host
    (driver config #5 mechanics; SURVEY §5.8)."""
    import gzip
    import os
    import socket
    import subprocess
    import sys

    path, idx, dens = mtx_file

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    def env_for(extra):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=4")
        env.update(extra)
        return env

    def cli(out, extra_args, extra_env):
        return subprocess.Popen(
            [sys.executable, "-m", "mmvae_tpu.cli.nb_vae",
             "--mtx", path, "--out", out, "--max_epoch", "2",
             "--recording", "2", "--batch_size", "24",
             "--superbatch", "2"] + extra_args,
            env=env_for(extra_env), cwd="/root/repo",
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )

    mh_out = str(tmp_path / "mh")
    procs = [
        cli(mh_out,
            ["--coordinator", f"localhost:{port}", "--num_hosts", "2",
             "--host_id", str(h)], {})
        for h in range(2)
    ]
    for p in procs:
        out, _ = p.communicate(timeout=560)
        assert p.returncode == 0, out.decode()[-2000:]

    sh_out = str(tmp_path / "sh")
    p = cli(sh_out, ["--no_auto_ondevice"], {})
    out, _ = p.communicate(timeout=560)
    assert p.returncode == 0, out.decode()[-2000:]

    def scores(h):
        return [float(v) for v in gzip.open(h + ".scores.gz", "rt")]

    assert scores(mh_out) == scores(sh_out)

    def mat(f):
        return np.array(
            [ln.split() for ln in gzip.open(f, "rt").readlines()], float
        )

    np.testing.assert_array_equal(
        mat(mh_out + "_1.mu_mean.gz"), mat(sh_out + "_1.mu_mean.gz")
    )
    np.testing.assert_array_equal(
        mat(mh_out + "_1_mu_decoding.weight.gz"),
        mat(sh_out + "_1_mu_decoding.weight.gz"),
    )
