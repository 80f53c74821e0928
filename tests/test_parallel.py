"""Multi-device (DP + TP) tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops.losses import nb_loss
from mmvae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
)
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import Trainer


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


def test_mesh_shapes():
    _need_devices(8)
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_param_sharding_shards_feature_axis():
    _need_devices(8)
    mesh = make_mesh(model_parallel=2)
    D = 256
    model = NBVAE(data_dim=D, covar_dim=1, mean_latent=4)
    params = model.init(jax.random.PRNGKey(0))
    shardings = param_sharding(mesh, params, D)
    # the big (D, latent) encoder weight shards over 'model'
    spec = shardings["mu_encoding"]["weight"].spec
    assert "model" in str(spec)
    # a latent-sized bias stays replicated
    spec_b = shardings["mu_representation_mean"]["bias"].spec
    assert "model" not in str(spec_b)


def test_dp_step_matches_single_device():
    """Data-parallel training step == single-device step (same PRNG)."""
    _need_devices(8)
    D, B, S = 64, 16, 2
    model = NBVAE(data_dim=D, covar_dim=1)
    rng = np.random.default_rng(0)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)

    def run(mesh):
        topt = TrainingOptions(nboot=2, superbatch=S, seed=0)
        tr = Trainer(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            lambda x, o, b: nb_loss(x, o, b), topt, mesh=mesh,
        )
        params = model.init(jax.random.PRNGKey(0))
        s = tr.optimizer.init(params)
        params, s, rep = tr.step(params, s, x_sb, c_sb, 0, np.arange(S))
        return params, np.asarray(rep)

    p1, r1 = run(None)
    p8, r8 = run(make_mesh())
    np.testing.assert_allclose(r1, r8, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dryrun_multichip():
    _need_devices(8)
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_dp_shard_map_matches_manual_simulation():
    """shard_map DP mode: per-shard noise/resampling, pmean'd grads.

    Verified against a hand-rolled simulation of the same semantics on
    one device: slice the batch per shard, fold the shard index into
    the PRNG key, average the shard gradients, apply one optimizer
    update.
    """
    import optax

    _need_devices(8)
    D, B, S, NDEV = 64, 16, 2, 8
    model = NBVAE(data_dim=D, covar_dim=1)
    rng = np.random.default_rng(1)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)

    topt = TrainingOptions(nboot=2, superbatch=S, seed=0)
    mesh = make_mesh()
    tr = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: nb_loss(x, o, b), topt, mesh=mesh,
        dp_shard_map=True,
    )
    params0 = model.init(jax.random.PRNGKey(0))
    s0 = tr.optimizer.init(params0)
    p_dp, s_dp, rep_dp = tr.step(
        jax.tree.map(jnp.array, params0), s0, x_sb, c_sb, 0, np.arange(S)
    )
    rep_dp = np.asarray(rep_dp)
    assert np.all(np.isfinite(rep_dp))

    # ---- manual single-device simulation of the same semantics ----
    from mmvae_tpu.ops.losses import kl_weight_schedule

    params = jax.tree.map(jnp.array, params0)
    opt_state = tr.optimizer.init(params)
    Bl = B // NDEV
    ekey = jax.random.fold_in(jax.random.PRNGKey(0), 0)  # epoch 0
    reports = []
    for b_id in range(S):
        beta = float(kl_weight_schedule(0.0, 1.0, 1e-2, 0.1))
        bkey = jax.random.fold_in(ekey, b_id)
        x = jnp.asarray(x_sb[b_id])
        c = jnp.asarray(c_sb[b_id])
        shard_keys = [
            jax.random.fold_in(bkey, d) for d in range(NDEV)
        ]
        # report: mean over shards of local losses
        locals_ = []
        for d, sk in enumerate(shard_keys):
            k_rep, _ = jax.random.split(sk)
            xl = x[d * Bl:(d + 1) * Bl]
            cl = c[d * Bl:(d + 1) * Bl]
            out = model.forward(params, xl, cl, k_rep, True)
            locals_.append(float(nb_loss(xl, out, beta)))
        reports.append(np.mean(locals_))
        # boots: pmean'd grads, one shared optimizer update per boot
        for i in range(topt.nboot):
            grad_acc = None
            for d, sk in enumerate(shard_keys):
                _, k_boot = jax.random.split(sk)
                kb = jax.random.fold_in(k_boot, i)
                k_idx, k_fwd = jax.random.split(kb)
                ridx = jax.random.randint(k_idx, (Bl,), 0, Bl)
                xl = x[d * Bl:(d + 1) * Bl][ridx]
                cl = c[d * Bl:(d + 1) * Bl][ridx]

                def lf(p):
                    o = model.forward(p, xl, cl, k_fwd, True)
                    return nb_loss(xl, o, beta)

                g = jax.grad(lf)(params)
                grad_acc = g if grad_acc is None else jax.tree.map(
                    jnp.add, grad_acc, g
                )
            grads = jax.tree.map(lambda a: a / NDEV, grad_acc)
            updates, opt_state = tr.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(rep_dp, reports, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dp_shard_map_with_fused_overrides():
    """shard_map DP with the model's fused step overrides (the CLI's
    --dp_shard configuration).  On CPU the kernels take their XLA
    fallback — this covers the shard_map plumbing around them."""
    _need_devices(8)
    D, B, S = 64, 16, 2
    model = NBVAE(data_dim=D, covar_dim=1)
    rng = np.random.default_rng(3)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)

    topt = TrainingOptions(nboot=2, superbatch=S, seed=0)
    tr = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: nb_loss(x, o, b), topt, mesh=make_mesh(),
        dp_shard_map=True,
        report_loss_override=lambda p, x, c, k, b: (
            model.fused_step_report(p, x, c, k, b)
        ),
        boot_loss_override=lambda p, x, c, k, b: (
            model.fused_step_boot(p, x, c, k, b)
        ),
    )
    params = model.init(jax.random.PRNGKey(0))
    s = tr.optimizer.init(params)
    params, s, rep = tr.step(params, s, x_sb, c_sb, 0, np.arange(S))
    rep = np.asarray(rep)
    assert rep.shape == (S,) and np.all(np.isfinite(rep))
    leaf = np.asarray(jax.tree_util.tree_leaves(params)[0])
    assert np.all(np.isfinite(leaf))


def test_tp_shard_map_fused_matches_dp():
    """Kernel-aware TP: the fused step under shard_map over
    ('data','model') — D-sharded params/x, psum'd normalizer and row
    reductions, shard-local weight grads — reproduces the DP-only
    trajectory (same 'data' axis size => identical per-shard PRNG).
    """
    from mmvae_tpu.ops import nb_step

    _need_devices(4)
    old = nb_step._INTERPRET
    nb_step._INTERPRET = True  # run the real Pallas kernels on CPU
    try:
        D, B, S = 64, 16, 2
        model = NBVAE(data_dim=D, covar_dim=1, mean_latent=2)
        rng = np.random.default_rng(3)
        x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
        c_sb = np.ones((S, B, 1), np.float32)
        topt = TrainingOptions(nboot=2, superbatch=S, seed=0)
        params0 = model.init(jax.random.PRNGKey(0))

        # baseline: DP shard_map over 2 devices, fused (non-TP) kernels
        mesh_dp = make_mesh(devices=jax.devices()[:2])
        tr_dp = Trainer(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            lambda x, o, b: nb_loss(x, o, b), topt, mesh=mesh_dp,
            dp_shard_map=True,
            report_loss_override=lambda p, x, c, k, b:
                model.fused_step_report(p, x, c, k, b),
            boot_loss_override=lambda p, x, c, k, b:
                model.fused_step_boot(p, x, c, k, b),
        )
        s0 = tr_dp.optimizer.init(params0)
        p_dp, _, rep_dp = tr_dp.step(
            jax.tree.map(jnp.array, params0), s0, x_sb, c_sb, 0,
            np.arange(S),
        )
        rep_dp = np.asarray(rep_dp)

        # TP: 2 data x 2 model, TP-aware fused step
        mesh_tp = make_mesh(model_parallel=2, devices=jax.devices()[:4])
        tr_tp = Trainer(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            lambda x, o, b: nb_loss(x, o, b), topt, mesh=mesh_tp,
            tp_shard_map=True, data_dim=D,
            report_loss_override=lambda p, x, c, k, b:
                model.fused_step_report_tp(p, x, c, k, b),
            boot_loss_override=lambda p, x, c, k, b:
                model.fused_step_boot_tp(p, x, c, k, b),
        )
        s1 = tr_tp.optimizer.init(jax.tree.map(jnp.array, params0))
        p_tp, _, rep_tp = tr_tp.step(
            jax.tree.map(jnp.array, params0), s1, x_sb, c_sb, 0,
            np.arange(S),
        )
        rep_tp = np.asarray(rep_tp)

        np.testing.assert_allclose(rep_tp, rep_dp, rtol=3e-5)
        leaves_dp = dict(jax.tree_util.tree_leaves_with_path(p_dp))
        for path, leaf in jax.tree_util.tree_leaves_with_path(p_tp):
            ref = leaves_dp[path]
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(ref), rtol=2e-4, atol=2e-6,
                err_msg=f"TP/DP param mismatch at "
                        f"{jax.tree_util.keystr(path)}",
            )
    finally:
        nb_step._INTERPRET = old


def test_tp_fallback_grads_match_single_device():
    """The TP XLA fallback (kernels disabled) must produce the same
    gradients as the single-device fused step: the softmax-normalizer
    psum keeps its summing transpose (per-shard cotangents) while the
    row cotangents are psum'd in the custom bwd (round-2 review bug)."""
    from jax.sharding import PartitionSpec as P

    from mmvae_tpu.parallel.mesh import tree_pspecs

    _need_devices(2)
    D, B = 64, 16
    model = NBVAE(data_dim=D, covar_dim=1, mean_latent=2)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.poisson(1.0, size=(B, D)).astype(np.float32))
    c = jnp.ones((B, 1), jnp.float32)
    key = jax.random.PRNGKey(5)
    beta = jnp.float32(0.5)

    g_ref = jax.grad(lambda p: model.fused_step_boot(p, x, c, key, beta))(
        params)

    mesh = make_mesh(model_parallel=2, devices=jax.devices()[:2])
    pspecs = tree_pspecs(params, D)

    def tp_loss(p, x, c):
        return model.fused_step_boot_tp(p, x, c, key, beta)

    f = jax.shard_map(
        lambda p, x, c: jax.grad(tp_loss)(p, x, c), mesh=mesh,
        in_specs=(pspecs, P(None, "model"), P()), out_specs=pspecs,
        check_vma=False,
    )
    g_tp = f(params, x, c)
    ref = dict(jax.tree_util.tree_leaves_with_path(g_ref))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_tp):
        b = np.asarray(ref[path])
        scale = max(1e-3, float(np.abs(b).max()))
        np.testing.assert_allclose(
            np.asarray(leaf), b, rtol=1e-4, atol=1e-5 * scale,
            err_msg=f"TP fallback grad mismatch at "
                    f"{jax.tree_util.keystr(path)}",
        )


def _tp_vs_dp_params_close(p_tp, p_dp, rtol=2e-4, atol=2e-6):
    leaves_dp = dict(jax.tree_util.tree_leaves_with_path(p_dp))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_tp):
        ref = np.asarray(leaves_dp[path])
        scale = max(1e-3, float(np.abs(ref).max()))
        np.testing.assert_allclose(
            np.asarray(leaf), ref, rtol=rtol, atol=atol * scale,
            err_msg=f"TP/DP param mismatch at "
                    f"{jax.tree_util.keystr(path)}",
        )


def _run_tp_vs_dp(model, params0, x_sb, c_sb, S, interpret):
    """DP shard_map (2 devices) vs TP (2 data x 2 model) with the
    model's fused step overrides; returns (report_dp, report_tp,
    params_dp, params_tp)."""
    from mmvae_tpu.ops import nb_step

    topt = TrainingOptions(nboot=2, superbatch=S, seed=0)
    old = nb_step._INTERPRET
    nb_step._INTERPRET = interpret
    try:
        mesh_dp = make_mesh(devices=jax.devices()[:2])
        tr_dp = Trainer(
            lambda p, x, c, k, t: None, lambda x, o, b: None, topt,
            mesh=mesh_dp, dp_shard_map=True,
            report_loss_override=lambda p, x, c, k, b:
                model.fused_step_report(p, x, c, k, b),
            boot_loss_override=lambda p, x, c, k, b:
                model.fused_step_boot(p, x, c, k, b),
        )
        s0 = tr_dp.optimizer.init(jax.tree.map(jnp.array, params0))
        p_dp, _, rep_dp = tr_dp.step(
            jax.tree.map(jnp.array, params0), s0, x_sb, c_sb, 0,
            np.arange(S),
        )

        D = x_sb.shape[-1]
        mesh_tp = make_mesh(model_parallel=2, devices=jax.devices()[:4])
        tr_tp = Trainer(
            lambda p, x, c, k, t: None, lambda x, o, b: None, topt,
            mesh=mesh_tp, tp_shard_map=True, data_dim=D,
            report_loss_override=lambda p, x, c, k, b:
                model.fused_step_report_tp(p, x, c, k, b),
            boot_loss_override=lambda p, x, c, k, b:
                model.fused_step_boot_tp(p, x, c, k, b),
        )
        s1 = tr_tp.optimizer.init(jax.tree.map(jnp.array, params0))
        p_tp, _, rep_tp = tr_tp.step(
            jax.tree.map(jnp.array, params0), s1, x_sb, c_sb, 0,
            np.arange(S),
        )
        return (np.asarray(rep_dp), np.asarray(rep_tp), p_dp, p_tp)
    finally:
        nb_step._INTERPRET = old


def test_tp_joint_matches_dp():
    """Joint vMF+NB TP (D-sharded joint kernels + sharded vMF decoder,
    VERDICT r2 item 3) reproduces the DP trajectory."""
    from mmvae_tpu.models.vmfnb import VMFNBVAE

    _need_devices(4)
    D, B, S = 64, 16, 2
    model = VMFNBVAE(data_dim=D, mean_latent=2)
    rng = np.random.default_rng(7)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)
    params0 = model.init(jax.random.PRNGKey(0))

    rep_dp, rep_tp, p_dp, p_tp = _run_tp_vs_dp(
        model, params0, x_sb, c_sb, S, interpret=True
    )
    np.testing.assert_allclose(rep_tp, rep_dp, rtol=3e-5)
    _tp_vs_dp_params_close(p_tp, p_dp)


def test_tp_mixture_matches_dp():
    """Mixture TP: D-sharded ln_vmf_mu/label/filter rows, psum'd E-step
    contraction and column norms (VERDICT r2 item 3)."""
    from mmvae_tpu.models.vmfnb_mixture import VMFNBMixtureVAE

    _need_devices(4)
    D, K, B, S = 64, 4, 16, 2
    rng = np.random.default_rng(11)
    # leave some features uncovered to exercise the filter mask
    L = (rng.uniform(size=(D, K)) < 0.4).astype(np.float32)
    L[:8] = 0.0
    model = VMFNBMixtureVAE(label=L, mean_latent=2)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)
    params0 = model.init(jax.random.PRNGKey(0))

    rep_dp, rep_tp, p_dp, p_tp = _run_tp_vs_dp(
        model, params0, x_sb, c_sb, S, interpret=True
    )
    np.testing.assert_allclose(rep_tp, rep_dp, rtol=3e-5)
    _tp_vs_dp_params_close(p_tp, p_dp)


def test_tp_vmf_matches_dp():
    """vMF TP (all-XLA sharded linear algebra, models/vmf.py
    tp_step_loss) reproduces the DP trajectory."""
    from mmvae_tpu.models.vmf import VMFVAE
    from mmvae_tpu.ops.losses import vmf_loss

    _need_devices(4)
    D, B, S = 64, 16, 2
    model = VMFVAE(data_dim=D, covar_dim=1, encoding=(8,), do_relu=True)
    rng = np.random.default_rng(13)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)
    params0 = model.init(jax.random.PRNGKey(0))
    topt = TrainingOptions(nboot=2, superbatch=S, seed=0)

    mesh_dp = make_mesh(devices=jax.devices()[:2])
    tr_dp = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: vmf_loss(x, o, b), topt, mesh=mesh_dp,
        dp_shard_map=True,
    )
    s0 = tr_dp.optimizer.init(jax.tree.map(jnp.array, params0))
    p_dp, _, rep_dp = tr_dp.step(
        jax.tree.map(jnp.array, params0), s0, x_sb, c_sb, 0, np.arange(S)
    )

    mesh_tp = make_mesh(model_parallel=2, devices=jax.devices()[:4])
    tr_tp = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: vmf_loss(x, o, b), topt, mesh=mesh_tp,
        tp_shard_map=True, data_dim=D,
        report_loss_override=lambda p, x, c, k, b:
            model.tp_step_loss(p, x, c, k, b),
        boot_loss_override=lambda p, x, c, k, b:
            model.tp_step_loss(p, x, c, k, b),
    )
    s1 = tr_tp.optimizer.init(jax.tree.map(jnp.array, params0))
    p_tp, _, rep_tp = tr_tp.step(
        jax.tree.map(jnp.array, params0), s1, x_sb, c_sb, 0, np.arange(S)
    )
    np.testing.assert_allclose(
        np.asarray(rep_tp), np.asarray(rep_dp), rtol=3e-5
    )
    _tp_vs_dp_params_close(p_tp, p_dp)


def test_tp_name_aware_pspecs_hidden_width_equals_D():
    """A hidden encoder width EQUAL to the feature dim D used to be
    silently mis-sharded by the size heuristic (VERDICT r2 item 7); the
    name-aware specs (model.tp_pspecs + named_tree_pspecs) shard only
    the true feature axes, so this trains and matches DP."""
    from jax.sharding import PartitionSpec as P

    from mmvae_tpu.parallel.mesh import named_tree_pspecs

    _need_devices(4)
    D, B, S = 32, 16, 1
    model = NBVAE(data_dim=D, covar_dim=1, mean_encoding=(D,),
                  do_relu=True)
    params0 = model.init(jax.random.PRNGKey(0))

    pspecs = model.tp_pspecs(params0)
    # the hidden->hidden stack layers must be replicated even though
    # their sizes equal D; the first layer is a (D, D) ROW shard
    assert pspecs["mu_encoding_1"]["weight"] == P("model", None)
    assert pspecs["mu_encoding_1"]["bias"] == P()
    assert pspecs["mu_representation_mean"]["weight"] == P()
    assert pspecs["mu_decoding"]["weight"] == P(None, "model")
    assert pspecs["mu_decoding"]["bias"] == P("model")

    # optimizer state inherits by trailing dict path
    import optax

    opt_state = optax.adam(1e-3).init(params0)
    o_specs = named_tree_pspecs(opt_state, pspecs)
    flat = {
        tuple(k.key for k in path
              if isinstance(k, jax.tree_util.DictKey)): s
        for path, s in jax.tree_util.tree_leaves_with_path(
            o_specs, is_leaf=lambda s: isinstance(s, P))
    }
    assert flat[("mu_encoding_1", "weight")] == P("model", None)
    assert flat[("mu_representation_mean", "weight")] == P()

    rng = np.random.default_rng(5)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)
    topt = TrainingOptions(nboot=1, superbatch=S, seed=0)

    mesh_dp = make_mesh(devices=jax.devices()[:2])
    tr_dp = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: nb_loss(x, o, b), topt, mesh=mesh_dp,
        dp_shard_map=True,
        report_loss_override=lambda p, x, c, k, b:
            model.fused_step_report(p, x, c, k, b),
        boot_loss_override=lambda p, x, c, k, b:
            model.fused_step_boot(p, x, c, k, b),
    )
    s0 = tr_dp.optimizer.init(jax.tree.map(jnp.array, params0))
    p_dp, _, rep_dp = tr_dp.step(
        jax.tree.map(jnp.array, params0), s0, x_sb, c_sb, 0, np.arange(S)
    )

    mesh_tp = make_mesh(model_parallel=2, devices=jax.devices()[:4])
    tr_tp = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: nb_loss(x, o, b), topt, mesh=mesh_tp,
        tp_shard_map=True, data_dim=D, tp_param_pspecs=pspecs,
        report_loss_override=lambda p, x, c, k, b:
            model.fused_step_report_tp(p, x, c, k, b),
        boot_loss_override=lambda p, x, c, k, b:
            model.fused_step_boot_tp(p, x, c, k, b),
    )
    s1 = tr_tp.optimizer.init(jax.tree.map(jnp.array, params0))
    p_tp, _, rep_tp = tr_tp.step(
        jax.tree.map(jnp.array, params0), s1, x_sb, c_sb, 0, np.arange(S)
    )
    np.testing.assert_allclose(
        np.asarray(rep_tp), np.asarray(rep_dp), rtol=3e-5
    )
    _tp_vs_dp_params_close(p_tp, p_dp)


def _dp_trajectory(model, topt, x_sb, c_sb, forward, loss_fn, fast_step,
                   epochs=2, **trainer_kw):
    tr = Trainer(forward, loss_fn, topt, mesh=make_mesh(),
                 dp_shard_map=True, fast_step=fast_step, **trainer_kw)
    params = model.init(jax.random.PRNGKey(0))
    s = tr.optimizer.init(params)
    reps = []
    for epoch in range(epochs):
        params, s, rep = tr.step(params, s, x_sb, c_sb, epoch,
                                 np.arange(x_sb.shape[0]))
        reps.append(np.asarray(rep))
    return params, np.concatenate(reps)


def _assert_trees_close(p_a, p_b, rtol=3e-3, atol=1e-4):
    flat_b = dict(jax.tree_util.tree_leaves_with_path(p_b))
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_a):
        np.testing.assert_allclose(
            np.asarray(flat_b[path]), np.asarray(leaf),
            rtol=rtol, atol=atol, err_msg=str(path),
        )


def test_dp_shard_map_fast_step_matches_generic_nb():
    """The packed fast step under shard_map DP draws the same per-shard
    PRNG streams as the generic DP path (fold_in(batch) then
    fold_in(shard)), so trajectories must agree up to the fast path's
    documented float reassociation."""
    from mmvae_tpu.ops.nb_fast import NBFastStep

    _need_devices(8)
    D, B, S = 640, 16, 2
    model = NBVAE(data_dim=D, covar_dim=1)
    rng = np.random.default_rng(5)
    x_sb = rng.poisson(0.7, size=(S, B, D)).astype(np.int16)
    c_sb = np.ones((S, B, 1), np.float32)
    topt = TrainingOptions(nboot=2, superbatch=S, seed=0)

    kw = dict(
        boot_loss_fn=lambda x, o, b: nb_loss(x, o, b,
                                             include_data_const=False),
        report_loss_override=lambda p, x, c, k, b: model.fused_step_report(
            p, x, c, k, b, include_data_const=True),
        boot_loss_override=lambda p, x, c, k, b: model.fused_step_boot(
            p, x, c, k, b),
    )
    fwd = lambda p, x, c, k, t: model.forward(p, x, c, k, t)
    lf = lambda x, o, b: nb_loss(x, o, b)
    p_gen, r_gen = _dp_trajectory(model, topt, x_sb, c_sb, fwd, lf,
                                  None, **kw)
    p_fast, r_fast = _dp_trajectory(model, topt, x_sb, c_sb, fwd, lf,
                                    NBFastStep(model, topt), **kw)
    np.testing.assert_allclose(r_fast, r_gen, rtol=2e-4)
    _assert_trees_close(p_gen, p_fast)


def test_dp_shard_map_fast_step_matches_generic_vmf():
    from mmvae_tpu.models.vmf import VMFVAE
    from mmvae_tpu.ops.losses import vmf_loss
    from mmvae_tpu.ops.vmf_fast import VMFFastStep

    _need_devices(8)
    D, B, S = 640, 16, 2
    model = VMFVAE(data_dim=D, covar_dim=1)
    rng = np.random.default_rng(7)
    x_sb = rng.poisson(0.7, size=(S, B, D)).astype(np.int16)
    c_sb = np.ones((S, B, 1), np.float32)
    topt = TrainingOptions(nboot=2, superbatch=S, seed=0)

    fwd = lambda p, x, c, k, t: model.forward(p, x, c, k, t)
    lf = lambda x, o, b: vmf_loss(x, o, b)
    p_gen, r_gen = _dp_trajectory(model, topt, x_sb, c_sb, fwd, lf, None)
    p_fast, r_fast = _dp_trajectory(model, topt, x_sb, c_sb, fwd, lf,
                                    VMFFastStep(model, topt))
    np.testing.assert_allclose(r_fast, r_gen, rtol=2e-4)
    _assert_trees_close(p_gen, p_fast)


def test_tp_recording_matches_dp(mtx_file, tmp_path):
    """TP in-scan recording — the host superbatch record step AND the
    on-device TP epoch runner — produces the same posterior artifacts
    and trajectory as DP over the same 'data' axis (whose in-scan
    recording is proven equal to the reference per-batch order)."""
    import gzip

    from mmvae_tpu.data import MtxDataBlock, create_ones_like
    from mmvae_tpu.io.index import build_mmutil_index
    from mmvae_tpu.train.loop import train_vae_model
    from mmvae_tpu.train.recorder import LatentRecorder

    _need_devices(8)
    path, idx, dens = mtx_file
    D = dens.shape[0]
    B = 24  # ntot=120 wrap-free; divisible over data=4

    def blocks():
        data = MtxDataBlock(path, idx, B)
        cov_path = str(tmp_path / "cov.mtx.gz")
        import os

        if not os.path.exists(cov_path):
            create_ones_like(data, cov_path)
            build_mmutil_index(cov_path)
        covar = MtxDataBlock(cov_path, cov_path + ".index", B)
        covar.auto_ones = True
        return data, covar

    model = NBVAE(data_dim=D, covar_dim=1, mean_latent=2)

    def run(tag, mesh=None, tp=False, ondevice=False):
        data, covar = blocks()
        topt = TrainingOptions(nboot=2, max_epoch=2, recording=2,
                               superbatch=2, seed=0, auto_ondevice=False)
        params = model.init(jax.random.PRNGKey(0))
        rec = LatentRecorder(
            str(tmp_path / tag), topt.max_epoch, data.ntot(),
            encode_fn=lambda p, x: model.encode_mu(p, x),
            write_params=False,
        )
        kw = {}
        if tp:
            kw = dict(
                tp_shard_map=True, data_dim=D,
                tp_param_pspecs=model.tp_pspecs(params),
                tp_record_encode=lambda p, x: model.tp_encode_mu(
                    p, x, None, "model"
                ),
                report_loss_override=lambda p, x, c, k, b:
                    model.fused_step_report_tp(p, x, c, k, b),
                boot_loss_override=lambda p, x, c, k, b:
                    model.fused_step_boot_tp(p, x, c, k, b),
            )
        elif mesh is not None:
            kw = dict(dp_shard_map=True)
        params, losses = train_vae_model(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            rec, data, covar, topt,
            lambda x, out, beta: nb_loss(x, out, beta),
            params, mesh=mesh, ondevice=ondevice, **kw,
        )

        def load(name):
            f = tmp_path / f"{tag}_1.{name}.gz"
            return np.loadtxt(gzip.open(f, "rt"))

        return losses, load("mu_mean"), load("mu_lnvar")

    # baseline: DP over data=4 (same per-shard PRNG as the TP meshes)
    mesh_dp = make_mesh(devices=jax.devices()[:4])
    l_dp, m_dp, v_dp = run("dp", mesh=mesh_dp)
    # TP host loop (superbatch record shard_map)
    l_tp, m_tp, v_tp = run("tp", mesh=make_mesh(model_parallel=2), tp=True)
    # TP on-device epochs (record variant of make_ondevice_epoch_tp)
    l_td, m_td, v_td = run("tpdev", mesh=make_mesh(model_parallel=2),
                           tp=True, ondevice=True)

    np.testing.assert_allclose(l_tp, l_dp, rtol=3e-5)
    np.testing.assert_allclose(l_td, l_dp, rtol=3e-5)
    for got_m, got_v in ((m_tp, v_tp), (m_td, v_td)):
        np.testing.assert_allclose(got_m, m_dp, rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(got_v, v_dp, rtol=1e-3, atol=1e-5)


def test_tp_step_record_mixture_matches_dp():
    """TP step_record with the mixture's TP record pair (frozen E-step
    encode + clust responsibilities) matches DP step_record running the
    host record functions — same 'data' axis => same trajectory, and
    the in-scan posteriors/assignments agree."""
    from mmvae_tpu.models.vmfnb_mixture import VMFNBMixtureVAE

    _need_devices(4)
    D, K, B, S = 64, 4, 16, 2
    rng = np.random.default_rng(17)
    L = (rng.uniform(size=(D, K)) < 0.4).astype(np.float32)
    L[:6] = 0.0
    model = VMFNBMixtureVAE(label=L, mean_latent=2)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)
    params0 = model.init(jax.random.PRNGKey(0))
    topt = TrainingOptions(nboot=2, superbatch=S, seed=0)
    rkey = jax.random.PRNGKey(0)

    def encode_fn(p, x):
        vmf = model.vmf_forward(p, x, rkey, False)
        return model.nb_encode_mu(p, x, vmf.latent)

    def extra_fn(p, x):
        return model.vmf_forward(p, x, rkey, False).latent

    mesh_dp = make_mesh(devices=jax.devices()[:2])
    tr_dp = Trainer(
        lambda p, x, c, k, t: None, lambda x, o, b: None, topt,
        mesh=mesh_dp, dp_shard_map=True,
        report_loss_override=lambda p, x, c, k, b:
            model.fused_step_report(p, x, c, k, b),
        boot_loss_override=lambda p, x, c, k, b:
            model.fused_step_boot(p, x, c, k, b),
    )
    s0 = tr_dp.optimizer.init(jax.tree.map(jnp.array, params0))
    p_dp, _, (rep_dp, enc_dp, ex_dp) = tr_dp.step_record(
        jax.tree.map(jnp.array, params0), s0, x_sb, c_sb, 0,
        np.arange(S), encode_fn, extra_fn,
    )

    mesh_tp = make_mesh(model_parallel=2, devices=jax.devices()[:4])
    tr_tp = Trainer(
        lambda p, x, c, k, t: None, lambda x, o, b: None, topt,
        mesh=mesh_tp, tp_shard_map=True, data_dim=D,
        report_loss_override=lambda p, x, c, k, b:
            model.fused_step_report_tp(p, x, c, k, b),
        boot_loss_override=lambda p, x, c, k, b:
            model.fused_step_boot_tp(p, x, c, k, b),
        tp_record_encode=lambda p, x: model.tp_nb_encode_mu(
            p, x, model.tp_vmf_forward(p, x, rkey, False, "model").latent,
            "model",
        ),
        tp_record_extra=lambda p, x: model.tp_vmf_forward(
            p, x, rkey, False, "model"
        ).latent,
    )
    s1 = tr_tp.optimizer.init(jax.tree.map(jnp.array, params0))
    p_tp, _, (rep_tp, enc_tp, ex_tp) = tr_tp.step_record(
        jax.tree.map(jnp.array, params0), s1, x_sb, c_sb, 0,
        np.arange(S), encode_fn, extra_fn,
    )

    np.testing.assert_allclose(np.asarray(rep_tp), np.asarray(rep_dp),
                               rtol=3e-5)
    for a, b in zip(enc_tp, enc_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    # frozen-mode hard Gumbel one-hot assignments are discrete: equal
    np.testing.assert_array_equal(np.asarray(ex_tp), np.asarray(ex_dp))
    _tp_vs_dp_params_close(p_tp, p_dp)


def test_tp_step_record_vmf_matches_dp():
    """vMF TP step_record (tp_encode over model-axis shards) matches DP
    step_record with the host encode."""
    from mmvae_tpu.models.vmf import VMFVAE
    from mmvae_tpu.ops.losses import vmf_loss

    _need_devices(4)
    D, B, S = 64, 16, 2
    model = VMFVAE(data_dim=D, covar_dim=1, encoding=(8,), do_relu=True)
    rng = np.random.default_rng(23)
    x_sb = rng.poisson(1.0, size=(S, B, D)).astype(np.float32)
    c_sb = np.ones((S, B, 1), np.float32)
    params0 = model.init(jax.random.PRNGKey(0))
    topt = TrainingOptions(nboot=2, superbatch=S, seed=0)
    encode_fn = lambda p, x: model.encode(p, x)

    mesh_dp = make_mesh(devices=jax.devices()[:2])
    tr_dp = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: vmf_loss(x, o, b), topt, mesh=mesh_dp,
        dp_shard_map=True,
    )
    s0 = tr_dp.optimizer.init(jax.tree.map(jnp.array, params0))
    p_dp, _, (rep_dp, enc_dp, _) = tr_dp.step_record(
        jax.tree.map(jnp.array, params0), s0, x_sb, c_sb, 0,
        np.arange(S), encode_fn,
    )

    mesh_tp = make_mesh(model_parallel=2, devices=jax.devices()[:4])
    tr_tp = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: vmf_loss(x, o, b), topt, mesh=mesh_tp,
        tp_shard_map=True, data_dim=D,
        tp_record_encode=lambda p, x: model.tp_encode(p, x, None, "model"),
        report_loss_override=lambda p, x, c, k, b:
            model.tp_step_loss(p, x, c, k, b),
        boot_loss_override=lambda p, x, c, k, b:
            model.tp_step_loss(p, x, c, k, b),
    )
    s1 = tr_tp.optimizer.init(jax.tree.map(jnp.array, params0))
    p_tp, _, (rep_tp, enc_tp, _) = tr_tp.step_record(
        jax.tree.map(jnp.array, params0), s1, x_sb, c_sb, 0,
        np.arange(S), encode_fn,
    )

    np.testing.assert_allclose(np.asarray(rep_tp), np.asarray(rep_dp),
                               rtol=3e-5)
    for a, b in zip(enc_tp, enc_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    _tp_vs_dp_params_close(p_tp, p_dp)
