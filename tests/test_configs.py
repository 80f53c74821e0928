"""End-to-end tests mirroring the driver benchmark configs
(BASELINE.json): CITE-seq two-modality joint training and data-parallel
training over the virtual device mesh."""

import gzip
import os
import subprocess
import sys

import numpy as np
import pytest


def _run_cli(module, args, extra_env=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-m", module] + args,
        capture_output=True, text=True, env=env, timeout=600,
    )


@pytest.fixture(scope="module")
def citeseq_mtx(tmp_path_factory):
    """Paired CITE-seq-style data: RNA genes + ADT proteins stacked as
    one feature axis (rows), cells as columns — the standard encoding
    for multimodal single-cell matrices."""
    from mmvae_tpu.io.writers import write_matrix_market_file

    tmp = tmp_path_factory.mktemp("cite")
    rng = np.random.default_rng(11)
    n_genes, n_adt, N = 40, 10, 60
    rna = rng.poisson(1.0, size=(n_genes, N))
    adt = rng.poisson(20.0, size=(n_adt, N))  # ADT counts are denser
    dens = np.concatenate([rna, adt]).astype(np.float32)
    dens[0, ~(dens > 0).any(axis=0)] = 1.0
    rr, cc = np.nonzero(dens)
    path = str(tmp / "cite.mtx.gz")
    write_matrix_market_file(path, rr, cc, dens[rr, cc], (n_genes + n_adt, N))
    # modality annotation: gene features vs protein features
    rows = str(tmp / "rows.txt")
    annot = str(tmp / "annot.txt")
    with open(rows, "w") as f:
        for i in range(n_genes):
            f.write(f"gene{i}\n")
        for i in range(n_adt):
            f.write(f"adt{i}\n")
    with open(annot, "w") as f:
        for i in range(n_genes):
            f.write(f"gene{i} RNA\n")
        for i in range(n_adt):
            f.write(f"adt{i} ADT\n")
    return path, rows, annot, dens


class TestCITEseq:
    def test_joint_two_modality(self, citeseq_mtx, tmp_path):
        """Driver config #4: joint NB+vMF on paired RNA+ADT — the NB
        likelihood models the counts, the vMF likelihood the
        direction; shared latent via the shared mu encoder."""
        path, rows, annot, dens = citeseq_mtx
        out = str(tmp_path / "cite")
        r = _run_cli("mmvae_tpu.cli.vmfnb_vae", [
            "--mtx", path, "--out", out, "--max_epoch", "3",
            "--recording", "3", "--batch_size", "30", "--mean_latent", "4",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        with gzip.open(out + ".scores.gz", "rt") as f:
            scores = [float(v) for v in f.read().split()]
        assert len(scores) == 3 and all(np.isfinite(scores))
        assert scores[-1] < scores[0]
        # shared latent posterior covers every cell
        with gzip.open(out + "_2.mu_mean.gz", "rt") as f:
            lat = np.array([ln.split() for ln in f.readlines()], float)
        assert lat.shape == (60, 4)

    def test_mixture_by_modality(self, citeseq_mtx, tmp_path):
        """Mixture variant with RNA/ADT as the two labeled components."""
        path, rows, annot, dens = citeseq_mtx
        out = str(tmp_path / "mix")
        r = _run_cli("mmvae_tpu.cli.vmfnb_vae", [
            "--mtx", path, "--out", out, "--max_epoch", "2",
            "--recording", "2", "--batch_size", "30",
            "--row", rows, "--annot", annot,
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        with gzip.open(out + "_1.clust.gz", "rt") as f:
            clust = np.array([ln.split() for ln in f.readlines()], float)
        assert clust.shape == (60, 2)


class TestDataParallel:
    def test_nb_vae_dp_cli(self, tmp_path):
        """Driver config #5 (mechanics): --data_parallel over the
        8-device virtual mesh, out-of-core input."""
        from mmvae_tpu.io.writers import write_matrix_market_file
        from tests.conftest import make_count_matrix

        rng = np.random.default_rng(3)
        rr, cc, vv, dens = make_count_matrix(rng, 32, 96)
        path = str(tmp_path / "dp.mtx.gz")
        write_matrix_market_file(path, rr, cc, vv, (32, 96))
        out = str(tmp_path / "dp")
        r = _run_cli(
            "mmvae_tpu.cli.nb_vae",
            ["--mtx", path, "--out", out, "--max_epoch", "2",
             "--batch_size", "48", "--data_parallel"],
            extra_env={
                "XLA_FLAGS": "--xla_force_host_platform_device_count=8"
            },
        )
        assert r.returncode == 0, r.stderr[-2000:]
        with gzip.open(out + ".scores.gz", "rt") as f:
            scores = [float(v) for v in f.read().split()]
        assert len(scores) == 2 and all(np.isfinite(scores))


def test_unknown_flags_warn_but_parse(capsys):
    """compose_parsers knows every option group, so leftover flags are
    typos; the CLIs warn on stderr instead of silently dropping them
    (e.g. ``--epochs`` for ``--epoch`` training 101 default epochs)."""
    from mmvae_tpu.cli.common import compose_parsers, warn_unknown_args
    from mmvae_tpu.cli.nb_vae import _model_args

    p = compose_parsers("t", _model_args)
    ns, unknown = p.parse_known_args(
        ["--mtx", "x.mtx.gz", "--epochs", "3"])
    assert unknown == ["--epochs", "3"]
    assert ns.max_epoch == 101  # the typo did NOT set the real flag
    warn_unknown_args(unknown)
    err = capsys.readouterr().err
    assert "unrecognized" in err and "--epochs" in err
    # known-flags path stays silent
    ns2, unknown2 = p.parse_known_args(["--mtx", "x.mtx.gz", "--epoch", "3"])
    assert unknown2 == [] and ns2.max_epoch == 3
    warn_unknown_args(unknown2)
    assert capsys.readouterr().err == ""
