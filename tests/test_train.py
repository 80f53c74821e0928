"""Training-loop tests: optimizer semantics, determinism, end-to-end CLI."""

import gzip
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops.losses import nb_loss
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import Trainer, make_optimizer
from mmvae_tpu.train.recorder import LatentRecorder, flatten_params, zeropad
from mmvae_tpu.train.checkpoint import load_checkpoint, save_checkpoint

D, C, B = 24, 1, 10


def _toy():
    rng = np.random.default_rng(0)
    x = rng.poisson(2.0, size=(B, D)).astype(np.float32)
    c = np.ones((B, C), np.float32)
    return x, c


class TestOptimizer:
    def test_matches_torch_adam_semantics(self):
        """clip -> +wd*param -> Adam must reproduce torch's update for a
        hand-computed single step."""
        import torch

        w0 = np.array([0.5, -1.0, 2.0], np.float32)
        g0 = np.array([10.0, -20.0, 5.0], np.float32)  # norm > 1 -> clipped

        # --- torch reference
        tw = torch.tensor(w0, requires_grad=True)
        adam = torch.optim.Adam([tw], lr=1e-3, weight_decay=1e-4)
        tw.grad = torch.tensor(g0)
        torch.nn.utils.clip_grad_norm_([tw], 1.0)
        adam.step()
        want = tw.detach().numpy()

        # --- ours
        opt = make_optimizer(TrainingOptions(lr=1e-3, grad_clip=1.0))
        params = {"w": jnp.asarray(w0)}
        state = opt.init(params)
        updates, state = opt.update({"w": jnp.asarray(g0)}, state, params)
        got = np.asarray(params["w"] + updates["w"])

        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


class TestTrainer:
    def _trainer(self, seed=0, superbatch=2):
        model = NBVAE(data_dim=D, covar_dim=C)
        topt = TrainingOptions(nboot=3, seed=seed, superbatch=superbatch,
                               max_epoch=2)
        trainer = Trainer(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            lambda x, out, beta: nb_loss(x, out, beta),
            topt,
        )
        params = model.init(jax.random.PRNGKey(seed))
        return trainer, params

    def test_loss_decreases(self):
        x, c = _toy()
        trainer, params = self._trainer()
        opt_state = trainer.optimizer.init(params)
        x_sb = np.stack([x] * 4)
        c_sb = np.stack([c] * 4)
        first = None
        for epoch in range(12):
            params, opt_state, rep = trainer.step(
                params, opt_state, x_sb, c_sb, epoch, np.arange(4)
            )
            if first is None:
                first = float(np.asarray(rep)[0])
        last = float(np.asarray(rep)[-1])
        assert last < first

    def test_deterministic_across_superbatch_sizes(self):
        """PRNG keys derive from (epoch, batch index), so splitting the
        same batches across different superbatch sizes must give
        bit-identical parameters."""
        x, c = _toy()
        xs = np.stack([x, x * 2, x + 1, x])
        cs = np.stack([c] * 4)

        def run(split):
            trainer, params = self._trainer()
            opt_state = trainer.optimizer.init(params)
            off = 0
            for n in split:
                params, opt_state, _ = trainer.step(
                    params, opt_state, xs[off: off + n], cs[off: off + n],
                    0, np.arange(off, off + n),
                )
                off += n
            return params

        p1 = run([4])
        p2 = run([1, 3])
        p3 = run([2, 2])
        for a, b in [(p1, p2), (p1, p3)]:
            for la, lb in zip(jax.tree_util.tree_leaves(a),
                              jax.tree_util.tree_leaves(b)):
                np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_nboot_steps_applied(self):
        """nboot gradient steps per batch: params must change more with
        nboot=3 than nboot=1 in one batch (weak but cheap signal), and
        differ between the two settings."""
        x, c = _toy()
        t3, params = self._trainer()
        t1_trainer = Trainer(t3.forward, t3.loss_fn,
                             TrainingOptions(nboot=1, seed=0))
        # step() donates params/opt_state buffers; keep private copies
        copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a), t)
        params3, params1 = copy(params), copy(params)
        s3 = t3.optimizer.init(params3)
        s1 = t1_trainer.optimizer.init(params1)
        p3, _, _ = t3.step(params3, s3, x[None], c[None], 0, np.array([0]))
        p1, _, _ = t1_trainer.step(params1, s1, x[None], c[None], 0,
                                   np.array([0]))
        d3 = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree_util.tree_leaves(p3), jax.tree_util.tree_leaves(params)))
        d1 = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(params)))
        assert d3 > d1 > 0


class TestRecorder:
    def test_zeropad(self):
        assert zeropad(2, 101) == "002"
        assert zeropad(99, 101) == "099"
        assert zeropad(5, 6) == "5"

    def test_flatten_params_orientation(self):
        model = NBVAE(data_dim=D, covar_dim=C)
        params = model.init(jax.random.PRNGKey(0))
        flat = flatten_params(params)
        # torch orientation: (out, in)
        assert flat["mu_encoding.weight"].shape == (2, D)
        assert flat["x_mean"].shape == (1, D)

    def test_update_and_write(self, tmp_path):
        model = NBVAE(data_dim=D, covar_dim=C)
        params = model.init(jax.random.PRNGKey(0))
        rec = LatentRecorder(
            str(tmp_path / "hdr"), 101, ntot=30,
            encode_fn=lambda p, x: model.encode_mu(p, x),
        )
        x, _ = _toy()
        rec.update_on_batch(params, jnp.asarray(x), np.arange(10))
        rec.update_on_batch(params, jnp.asarray(x), np.arange(20, 30))
        rec.update_on_epoch(params, 9)
        assert (tmp_path / "hdr_009.mu_mean.gz").exists()
        assert (tmp_path / "hdr_009_depth.weight.gz").exists()
        with gzip.open(tmp_path / "hdr_009.mu_mean.gz", "rt") as f:
            lines = f.readlines()
        assert len(lines) == 30
        # rows 10..19 were never visited -> zeros
        assert all(float(v) == 0.0 for v in lines[15].split())


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model = NBVAE(data_dim=D, covar_dim=C)
        topt = TrainingOptions()
        opt = make_optimizer(topt)
        params = model.init(jax.random.PRNGKey(0))
        state = opt.init(params)
        save_checkpoint(str(tmp_path), params, state, 7, 0, [1.0, 0.5])
        p2, s2, next_epoch, losses = load_checkpoint(str(tmp_path), params, state)
        assert next_epoch == 8
        assert losses == [1.0, 0.5]
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_reordered_optimizer_raises(self, tmp_path):
        """Named opt-state keys: a reordered chain with the same leaf
        count must raise, not silently mis-restore moments (round-1
        weak #6)."""
        import optax

        model = NBVAE(data_dim=D, covar_dim=C)
        params = model.init(jax.random.PRNGKey(0))
        topt = TrainingOptions()
        opt = make_optimizer(topt)
        state = opt.init(params)
        save_checkpoint(str(tmp_path), params, state, 3, 0, [1.0])

        lr, wd = topt.lr, 1e-4
        # same transforms, opposite order => same leaf count, different paths
        reordered = optax.chain(
            optax.scale_by_adam(),
            optax.clip_by_global_norm(topt.grad_clip),
            optax.add_decayed_weights(wd),
            optax.scale(-lr),
        )
        re_state = reordered.init(params)
        n_a = len(jax.tree_util.tree_leaves(state))
        n_b = len(jax.tree_util.tree_leaves(re_state))
        if n_a == n_b:
            with pytest.raises(ValueError):
                load_checkpoint(str(tmp_path), params, re_state)


@pytest.fixture(scope="module")
def train_mtx(tmp_path_factory):
    from mmvae_tpu.io.writers import write_matrix_market_file

    tmp = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(5)
    Dd, N = 30, 80
    dens = rng.poisson(1.5, size=(Dd, N)).astype(np.float32)
    dens[0, ~(dens > 0).any(axis=0)] = 1.0
    rr, cc = np.nonzero(dens)
    path = str(tmp / "train.mtx.gz")
    write_matrix_market_file(path, rr, cc, dens[rr, cc], (Dd, N))
    return path


def _run_cli(module, args, extra_env=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-m", module] + args,
        capture_output=True, text=True, env=env, timeout=600,
    )


class TestCLI:
    def test_nb_vae_end_to_end(self, train_mtx, tmp_path):
        out = str(tmp_path / "nb")
        r = _run_cli("mmvae_tpu.cli.nb_vae", [
            "--mtx", train_mtx, "--out", out, "--max_epoch", "4",
            "--recording", "2", "--batch_size", "40",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        with gzip.open(out + ".scores.gz", "rt") as f:
            scores = [float(v) for v in f.read().split()]
        assert len(scores) == 4
        assert all(np.isfinite(scores))
        assert scores[-1] < scores[0]  # training reduces the loss
        assert os.path.exists(out + "_1.mu_mean.gz")
        assert os.path.exists(out + "_3.mu_lnvar.gz")
        assert os.path.exists(out + ".covar.mtx.gz")  # auto covariate

    def test_vmf_vae_end_to_end(self, train_mtx, tmp_path):
        out = str(tmp_path / "vmf")
        r = _run_cli("mmvae_tpu.cli.vmf_vae", [
            "--mtx", train_mtx, "--out", out, "--max_epoch", "3",
            "--recording", "3", "--batch_size", "40", "--latent", "2",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        with gzip.open(out + ".scores.gz", "rt") as f:
            scores = [float(v) for v in f.read().split()]
        assert len(scores) == 3 and all(np.isfinite(scores))
        assert os.path.exists(out + "_2.latent_mean.gz")

    def test_vmfnb_vae_joint(self, train_mtx, tmp_path):
        out = str(tmp_path / "joint")
        r = _run_cli("mmvae_tpu.cli.vmfnb_vae", [
            "--mtx", train_mtx, "--out", out, "--max_epoch", "2",
            "--recording", "2", "--batch_size", "40",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        with gzip.open(out + ".scores.gz", "rt") as f:
            scores = [float(v) for v in f.read().split()]
        assert len(scores) == 2 and all(np.isfinite(scores))
        assert os.path.exists(out + "_1.mu_mean.gz")

    def test_vmfnb_vae_mixture(self, train_mtx, tmp_path):
        # feature list + annotation over 30 features, 2 labels
        rows = str(tmp_path / "rows.txt")
        annot = str(tmp_path / "annot.txt")
        with open(rows, "w") as f:
            for i in range(30):
                f.write(f"g{i}\n")
        with open(annot, "w") as f:
            for i in range(30):
                f.write(f"g{i} label{i % 2}\n")
        out = str(tmp_path / "mix")
        r = _run_cli("mmvae_tpu.cli.vmfnb_vae", [
            "--mtx", train_mtx, "--out", out, "--max_epoch", "2",
            "--recording", "2", "--batch_size", "40",
            "--row", rows, "--annot", annot,
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(out + "_1.clust.gz")
        with gzip.open(out + "_1.clust.gz", "rt") as f:
            clust = np.array([ln.split() for ln in f.readlines()], float)
        assert clust.shape == (80, 2)  # N x K assignments
        # eval-mode recording: hard Gumbel one-hot rows, not soft
        # responsibilities (vmfnb_mixture.hh:692-695, 741-795)
        assert np.array_equal(np.sort(clust, axis=1),
                              np.tile([0.0, 1.0], (80, 1)))

        # the on-device recording path must produce identical artifacts
        out2 = str(tmp_path / "mix_ondev")
        r2 = _run_cli("mmvae_tpu.cli.vmfnb_vae", [
            "--mtx", train_mtx, "--out", out2, "--max_epoch", "2",
            "--recording", "2", "--batch_size", "40",
            "--row", rows, "--annot", annot, "--ondevice",
        ])
        assert r2.returncode == 0, r2.stderr[-2000:]
        with gzip.open(out2 + "_1.clust.gz", "rt") as f:
            clust2 = np.array([ln.split() for ln in f.readlines()], float)
        assert np.array_equal(clust, clust2)

    def test_nb_vae_checkpoint_resume(self, train_mtx, tmp_path):
        out = str(tmp_path / "ck")
        ckpt = str(tmp_path / "ckpt")
        r = _run_cli("mmvae_tpu.cli.nb_vae", [
            "--mtx", train_mtx, "--out", out, "--max_epoch", "2",
            "--batch_size", "40", "--checkpoint_dir", ckpt,
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        # post-hoc whole-dataset encode from the checkpoint
        r = _run_cli("mmvae_tpu.cli.encode", [
            "--model", "nb", "--mtx", train_mtx,
            "--checkpoint", ckpt, "--out", str(tmp_path / "enc"),
            "--batch_size", "40",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        import numpy as np
        from mmvae_tpu.io.writers import read_data_file

        enc = read_data_file(str(tmp_path / "enc.mu_mean.gz"))
        assert enc.shape == (80, 2)
        assert np.isfinite(enc).all()
        r = _run_cli("mmvae_tpu.cli.nb_vae", [
            "--mtx", train_mtx, "--out", out, "--max_epoch", "4",
            "--batch_size", "40", "--resume", ckpt,
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        with gzip.open(out + ".scores.gz", "rt") as f:
            scores = [float(v) for v in f.read().split()]
        assert len(scores) == 4  # 2 restored + 2 new


class TestDataModes:
    def test_stream_matches_memory_trajectory(self, train_mtx, tmp_path):
        """--data_mode stream (the reference's out-of-core path) must
        produce the same scores as the in-memory/on-device modes —
        batch contents and the PRNG schedule are mode-invariant."""
        outs = {}
        for mode in ("stream", "memory"):
            out = str(tmp_path / mode)
            r = _run_cli("mmvae_tpu.cli.nb_vae", [
                "--mtx", train_mtx, "--out", out, "--max_epoch", "3",
                "--recording", "3", "--batch_size", "40",
                "--data_mode", mode,
            ])
            assert r.returncode == 0, r.stderr[-2000:]
            with gzip.open(out + ".scores.gz", "rt") as f:
                outs[mode] = [float(v) for v in f.read().split()]
        assert outs["stream"] == outs["memory"]


def test_visit_data_sweep(tmp_path):
    """visit_data: the model-free dataset sweep scaffold
    (mmvae_alg.hh:127-160)."""
    from mmvae_tpu.data import MtxMemoryBlock
    from mmvae_tpu.io.writers import write_matrix_market_file
    from mmvae_tpu.train.loop import visit_data

    rng = np.random.default_rng(0)
    dens = rng.poisson(1.0, size=(6, 20)).astype(np.float32)
    dens[0, ~(dens > 0).any(axis=0)] = 1.0
    rr, cc = np.nonzero(dens)
    path = str(tmp_path / "v.mtx.gz")
    write_matrix_market_file(path, rr, cc, dens[rr, cc], dens.shape)
    blk = MtxMemoryBlock(path, "", 8)

    class SumVisitor:
        total = 0.0
        seen = 0

        def update_on_batch(self, x, batch):
            ok = batch < dens.shape[1]
            # wrap-around duplicates: count first visits only
            self.total += float(x[:np.count_nonzero(ok)].sum())
            self.seen += 1

    v = SumVisitor()
    visit_data(v, blk)
    assert v.seen == 3  # 20 cells / batch 8 -> 3 wrap-around batches


def test_encode_mixture_and_tp_checkpoints(train_mtx, tmp_path):
    """encode loads checkpoints params-only (works for the clipless
    --tensor_parallel chain) and supports the labeled mixture,
    writing the promised .clust.gz (round-2 review findings)."""
    from mmvae_tpu.io.writers import read_data_file

    # mixture checkpoint -> encode --model mixture
    rows = str(tmp_path / "rows.txt")
    annot = str(tmp_path / "annot.txt")
    with open(rows, "w") as f:
        for i in range(30):
            f.write(f"g{i}\n")
    with open(annot, "w") as f:
        for i in range(30):
            f.write(f"g{i} label{i % 2}\n")
    ckpt = str(tmp_path / "mix_ckpt")
    r = _run_cli("mmvae_tpu.cli.vmfnb_vae", [
        "--mtx", train_mtx, "--out", str(tmp_path / "mix"),
        "--max_epoch", "1", "--batch_size", "40",
        "--row", rows, "--annot", annot, "--checkpoint_dir", ckpt,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli("mmvae_tpu.cli.encode", [
        "--model", "mixture", "--mtx", train_mtx,
        "--checkpoint", ckpt, "--out", str(tmp_path / "menc"),
        "--batch_size", "40", "--row", rows, "--annot", annot,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    clust = read_data_file(str(tmp_path / "menc.clust.gz"))
    assert clust.shape == (80, 2)
    assert np.array_equal(np.sort(clust, axis=1),
                          np.tile([0.0, 1.0], (80, 1)))  # one-hot

    # chunked dispatch must not perturb the frozen per-batch Gumbel
    # draws: one-dispatch-per-batch reproduces the same assignments
    r = _run_cli("mmvae_tpu.cli.encode", [
        "--model", "mixture", "--mtx", train_mtx,
        "--checkpoint", ckpt, "--out", str(tmp_path / "menc1"),
        "--batch_size", "40", "--row", rows, "--annot", annot,
        "--chunk_batches", "1",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert np.array_equal(
        clust, read_data_file(str(tmp_path / "menc1.clust.gz")))

    # TP checkpoint (clipless optimizer chain) -> params-only encode
    ckpt2 = str(tmp_path / "tp_ckpt")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, "-m", "mmvae_tpu.cli.nb_vae",
         "--mtx", train_mtx, "--out", str(tmp_path / "tp"),
         "--max_epoch", "1", "--batch_size", "40",
         "--tensor_parallel", "2", "--checkpoint_dir", ckpt2],
        env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(
            __file__))), capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli("mmvae_tpu.cli.encode", [
        "--model", "nb", "--mtx", train_mtx,
        "--checkpoint", ckpt2, "--out", str(tmp_path / "tenc"),
        "--batch_size", "40",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    enc = read_data_file(str(tmp_path / "tenc.mu_mean.gz"))
    assert enc.shape == (80, 2) and np.isfinite(enc).all()


def test_encode_chunk_invariance(train_mtx, tmp_path):
    """--chunk_batches only changes dispatch grouping: outputs are
    identical for any chunk size, including a ragged tail chunk."""
    from mmvae_tpu.io.writers import read_data_file

    ckpt = str(tmp_path / "ckpt")
    r = _run_cli("mmvae_tpu.cli.nb_vae", [
        "--mtx", train_mtx, "--out", str(tmp_path / "t"),
        "--max_epoch", "1", "--batch_size", "40",
        "--checkpoint_dir", ckpt,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    outs = {}
    for chunk in (1, 4):  # batch 8 over N=80: 10 batches -> 4+4+2 tail
        out = str(tmp_path / f"enc{chunk}")
        r = _run_cli("mmvae_tpu.cli.encode", [
            "--model", "nb", "--mtx", train_mtx, "--checkpoint", ckpt,
            "--out", out, "--batch_size", "8",
            "--chunk_batches", str(chunk),
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        outs[chunk] = (read_data_file(out + ".mu_mean.gz"),
                       read_data_file(out + ".mu_lnvar.gz"))
    assert np.array_equal(outs[1][0], outs[4][0])
    assert np.array_equal(outs[1][1], outs[4][1])


def test_encode_resident_matches_streaming(train_mtx, tmp_path):
    """The dense-resident serving sweep (one jitted lax.map over the
    device-resident counts) is bitwise equal to the streaming chunked
    path (MMVAE_DENSE_BYTES=1 forces the fallback)."""
    from mmvae_tpu.io.writers import read_data_file

    ckpt = str(tmp_path / "ckpt")
    r = _run_cli("mmvae_tpu.cli.nb_vae", [
        "--mtx", train_mtx, "--out", str(tmp_path / "t"),
        "--max_epoch", "1", "--batch_size", "40",
        "--checkpoint_dir", ckpt,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    args = ["--model", "nb", "--mtx", train_mtx, "--checkpoint", ckpt,
            "--batch_size", "40"]
    r = _run_cli("mmvae_tpu.cli.encode",
                 args + ["--out", str(tmp_path / "res")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dense-resident" in r.stderr
    r = _run_cli("mmvae_tpu.cli.encode",
                 args + ["--out", str(tmp_path / "str")],
                 extra_env={"MMVAE_DENSE_BYTES": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dense-resident" not in r.stderr
    for suffix in ("mu_mean", "mu_lnvar"):
        a = read_data_file(str(tmp_path / f"res.{suffix}.gz"))
        b = read_data_file(str(tmp_path / f"str.{suffix}.gz"))
        assert np.array_equal(a, b), suffix


def test_encode_resident_matches_streaming_mixture(train_mtx, tmp_path):
    """Resident-vs-streaming equality for the mixture model: the frozen
    per-batch Gumbel draw (fixed seed key) must be identical across the
    two dispatch shapes."""
    from mmvae_tpu.io.writers import read_data_file

    rows = str(tmp_path / "rows.txt")
    annot = str(tmp_path / "annot.txt")
    with open(rows, "w") as f:
        for i in range(30):
            f.write(f"g{i}\n")
    with open(annot, "w") as f:
        for i in range(30):
            f.write(f"g{i} label{i % 2}\n")
    ckpt = str(tmp_path / "ck")
    r = _run_cli("mmvae_tpu.cli.vmfnb_vae", [
        "--mtx", train_mtx, "--out", str(tmp_path / "m"),
        "--max_epoch", "1", "--batch_size", "40",
        "--row", rows, "--annot", annot, "--checkpoint_dir", ckpt,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    args = ["--model", "mixture", "--mtx", train_mtx, "--checkpoint",
            ckpt, "--batch_size", "40", "--row", rows, "--annot", annot]
    r = _run_cli("mmvae_tpu.cli.encode",
                 args + ["--out", str(tmp_path / "res")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dense-resident" in r.stderr
    r = _run_cli("mmvae_tpu.cli.encode",
                 args + ["--out", str(tmp_path / "str")],
                 extra_env={"MMVAE_DENSE_BYTES": "1"})
    assert r.returncode == 0, r.stderr[-2000:]
    for suffix in ("mu_mean", "mu_lnvar", "clust"):
        a = read_data_file(str(tmp_path / f"res.{suffix}.gz"))
        b = read_data_file(str(tmp_path / f"str.{suffix}.gz"))
        assert np.array_equal(a, b), suffix


def test_pretty_print_handles_array_fields():
    """Array-valued model config fields of any rank (np OR jax) print as
    shape summaries, never as full contents, and never crash."""
    import io as _io
    from dataclasses import dataclass, field

    from mmvae_tpu.utils.summary import pretty_print

    @dataclass
    class Toy:
        mask: np.ndarray = field(
            default_factory=lambda: np.ones(7, np.float32))
        label: object = None
        name: str = "toy"

    toy = Toy(label=jnp.ones((5, 3), jnp.float32))
    buf = _io.StringIO()
    params = {"dec": {"weight": np.zeros((4, 2)), "bias": np.zeros(2),
                      "extra": np.zeros(3)},
              "kappa": np.zeros(())}
    pretty_print(toy, params, file=buf)
    text = buf.getvalue()
    assert "mask=<7 array>" in text
    assert "label=<5x3 array>" in text
    # total counts weight+bias+extra+kappa = 8+2+3+1
    assert "[14 parameters]" in text
    # no dumped contents
    assert "1. 1. 1." not in text


def test_decode_threads_env_fallback(monkeypatch):
    from mmvae_tpu.io.native import decode_threads

    monkeypatch.setenv("MMVAE_DECODE_THREADS", "3")
    assert decode_threads() == 3
    monkeypatch.setenv("MMVAE_DECODE_THREADS", "auto")
    assert decode_threads() >= 1  # malformed -> warn + cpu_count fallback
    monkeypatch.delenv("MMVAE_DECODE_THREADS")
    # default leaves headroom for the XLA host/prefetch threads
    assert 1 <= decode_threads() <= 8


def test_encode_tensor_parallel_matches_single(train_mtx, tmp_path):
    """--tensor_parallel serving: the dense-resident sweep under a
    ('data', 'model') shard_map (training's TP feature layout) must
    reproduce the single-device sweep to reassociation level, for the
    plain NB encoder and for the mixture (incl. identical hard-Gumbel
    cluster assignments)."""
    from mmvae_tpu.io.writers import read_data_file

    eightdev = {"XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                              + " --xla_force_host_platform_device_count=8")}

    # --- NB ---
    ckpt = str(tmp_path / "ck_nb")
    r = _run_cli("mmvae_tpu.cli.nb_vae", [
        "--mtx", train_mtx, "--out", str(tmp_path / "nb"),
        "--max_epoch", "1", "--batch_size", "40",
        "--checkpoint_dir", ckpt,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli("mmvae_tpu.cli.encode", [
        "--model", "nb", "--mtx", train_mtx, "--checkpoint", ckpt,
        "--out", str(tmp_path / "e1"), "--batch_size", "40",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dense-resident" in r.stderr
    r = _run_cli("mmvae_tpu.cli.encode", [
        "--model", "nb", "--mtx", train_mtx, "--checkpoint", ckpt,
        "--out", str(tmp_path / "e2"), "--batch_size", "40",
        "--tensor_parallel", "2",
    ], extra_env=eightdev)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TP serving over (data=2, model=2)" in r.stderr
    for nm in ("mu_mean", "mu_lnvar"):
        a = read_data_file(str(tmp_path / f"e1.{nm}.gz"))
        b = read_data_file(str(tmp_path / f"e2.{nm}.gz"))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)

    # --- mixture (off-params (D, K) label state + frozen Gumbel) ---
    rows = str(tmp_path / "rows.txt")
    annot = str(tmp_path / "annot.txt")
    with open(rows, "w") as f:
        f.write("\n".join(f"g{i}" for i in range(30)) + "\n")
    with open(annot, "w") as f:
        f.write("\n".join(f"g{i} label{i % 2}" for i in range(30)) + "\n")
    ckpt2 = str(tmp_path / "ck_mix")
    r = _run_cli("mmvae_tpu.cli.vmfnb_vae", [
        "--mtx", train_mtx, "--out", str(tmp_path / "mx"),
        "--max_epoch", "1", "--batch_size", "40",
        "--row", rows, "--annot", annot, "--checkpoint_dir", ckpt2,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli("mmvae_tpu.cli.encode", [
        "--model", "mixture", "--mtx", train_mtx, "--checkpoint", ckpt2,
        "--out", str(tmp_path / "m1"), "--batch_size", "40",
        "--row", rows, "--annot", annot,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run_cli("mmvae_tpu.cli.encode", [
        "--model", "mixture", "--mtx", train_mtx, "--checkpoint", ckpt2,
        "--out", str(tmp_path / "m2"), "--batch_size", "40",
        "--row", rows, "--annot", annot, "--tensor_parallel", "2",
    ], extra_env=eightdev)
    assert r.returncode == 0, r.stderr[-2000:]
    for nm in ("mu_mean", "mu_lnvar"):
        a = read_data_file(str(tmp_path / f"m1.{nm}.gz"))
        b = read_data_file(str(tmp_path / f"m2.{nm}.gz"))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)
    assert np.array_equal(read_data_file(str(tmp_path / "m1.clust.gz")),
                          read_data_file(str(tmp_path / "m2.clust.gz")))
