"""v3 packed fast step (ops/nb_fast.py) vs the v2 generic path.

The fast path must reproduce the v2 trainer's trajectory (same PRNG
schedule, same optimizer chain, same kernels) up to float reassociation
from the hoisted-L encoder algebra and the packed clip norm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops import nb_step
from mmvae_tpu.ops.losses import nb_loss
from mmvae_tpu.ops.nb_fast import NBFastStep
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import Trainer


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(nb_step, "_INTERPRET", True)


def _mk_data(S=2, B=8, D=640, seed=3, dtype=np.int16):
    rng = np.random.default_rng(seed)
    x = rng.poisson(0.7, size=(S, B, D)).astype(dtype)
    c = np.ones((S, B, 1), np.float32)
    return x, c


def _make_trainers(model, topt, fast):
    kw = {}
    if fast:
        kw["fast_step"] = NBFastStep(model, topt)
    return Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: nb_loss(x, o, b),
        topt,
        boot_loss_fn=lambda x, o, b: nb_loss(x, o, b,
                                             include_data_const=False),
        report_loss_override=lambda p, x, c, k, b: model.fused_step_report(
            p, x, c, k, b, include_data_const=True),
        boot_loss_override=lambda p, x, c, k, b: model.fused_step_boot(
            p, x, c, k, b),
        **kw,
    )


def test_pack_unpack_roundtrip():
    model = NBVAE(data_dim=640, covar_dim=1, mean_latent=2)
    params = model.init(jax.random.PRNGKey(1))
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    fast = NBFastStep(model, topt)
    back = fast.unpack(fast.pack(params))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


@pytest.mark.parametrize("dtype", [np.int16, np.float32])
def test_fast_matches_v2_trajectory(dtype):
    model = NBVAE(data_dim=640, covar_dim=1, mean_latent=2)
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    x, c = _mk_data(dtype=dtype)

    results = []
    for fast in (False, True):
        tr = _make_trainers(model, topt, fast)
        params = model.init(jax.random.PRNGKey(0))
        s = tr.optimizer.init(params)
        reps = []
        for epoch in range(2):
            params, s, rep = tr.step(params, s, x, c, epoch,
                                     np.arange(x.shape[0]))
            reps.append(np.asarray(rep))
        results.append((params, np.concatenate(reps)))

    (p2, r2), (p3, r3) = results
    np.testing.assert_allclose(r3, r2, rtol=2e-4)
    for path, leaf in jax.tree_util.tree_leaves_with_path(p2):
        other = dict(jax.tree_util.tree_leaves_with_path(p3))[path]
        np.testing.assert_allclose(np.asarray(other), np.asarray(leaf),
                                   rtol=3e-3, atol=2e-5,
                                   err_msg=str(path))


def test_fast_int_float_invariance():
    """int16 and f32 inputs produce identical trajectories on the fast
    path (the widening happens inside the same fused ops)."""
    model = NBVAE(data_dim=640, covar_dim=1, mean_latent=2)
    topt = TrainingOptions(nboot=2, superbatch=2, seed=0)
    xi, c = _mk_data(dtype=np.int16)
    xf = xi.astype(np.float32)
    outs = []
    for x in (xi, xf):
        tr = _make_trainers(model, topt, fast=True)
        params = model.init(jax.random.PRNGKey(0))
        s = tr.optimizer.init(params)
        params, s, rep = tr.step(params, s, x, c, 0, np.arange(2))
        outs.append(np.asarray(rep))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_batch_step_key_vs_predrawn_rand_bitwise():
    """Epoch runners pre-draw all randomness (draw_rand) and the scan
    consumes slices; the draws must be BITWISE equal to the in-step
    schedule (counter-based PRNG is a pure function of the key, vmapped
    or not), and the stepped state must match up to cross-compilation
    float reassociation."""
    x, c = _mk_data(S=1, B=8, D=640)
    model = NBVAE(data_dim=640, covar_dim=1)
    topt = TrainingOptions(nboot=3, superbatch=1, seed=0)
    fast = NBFastStep(model, topt)
    params = model.init(jax.random.PRNGKey(1))
    q = fast.pack(params)
    po = fast.optimizer.init(q)
    xb, cb = jnp.asarray(x[0]), jnp.asarray(c[0])
    ekey = jax.random.PRNGKey(7)
    b_ids = jnp.arange(4, dtype=jnp.int32)

    key = jax.random.fold_in(ekey, b_ids[2])
    draws_in = jax.jit(lambda k: fast._draw_batch(k, 8))(key)
    rand_all = jax.jit(lambda: fast.draw_rand(ekey, b_ids, 8))()
    rnd = jax.tree_util.tree_map(lambda a: a[2], rand_all)
    for la, lb in zip(jax.tree_util.tree_leaves(draws_in),
                      jax.tree_util.tree_leaves(rnd)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    q_a, po_a, rep_a = jax.jit(fast.batch_step)(q, po, xb, cb, 0.0, key)
    q_b, po_b, rep_b = jax.jit(
        lambda *a, rand: fast.batch_step(*a, rand=rand)
    )(q, po, xb, cb, 0.0, rand=rnd)
    np.testing.assert_allclose(np.asarray(rep_a), np.asarray(rep_b),
                               rtol=1e-6)
    for la, lb in zip(jax.tree_util.tree_leaves((q_a, po_a)),
                      jax.tree_util.tree_leaves((q_b, po_b))):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=1e-6)


def test_rand_pspecs_match_draw_structure_all_models():
    """rand_pspecs must mirror each fast step's actual draw_rand pytree
    (the DP on-device runner's shard_map out_specs) — a hardcoded
    NB-shaped spec dict crashed the vMF (1-tuple boot_eps) and joint
    (3-tuple) fast steps under --dp_shard on-device epochs."""
    from jax.sharding import PartitionSpec as P

    from mmvae_tpu.models.vmf import VMFVAE
    from mmvae_tpu.models.vmfnb import VMFNBVAE
    from mmvae_tpu.models.vmfnb_mixture import VMFNBMixtureVAE
    from mmvae_tpu.ops.vmf_fast import VMFFastStep
    from mmvae_tpu.ops.vmfnb_fast import (
        VMFNBFastStep,
        VMFNBMixtureFastStep,
    )

    D = 640
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    label = (np.random.default_rng(0).uniform(size=(D, 4)) < 0.4
             ).astype(np.float32)
    steps = [
        NBFastStep(NBVAE(data_dim=D, covar_dim=1), topt),
        VMFFastStep(VMFVAE(data_dim=D, covar_dim=1), topt),
        VMFNBFastStep(VMFNBVAE(data_dim=D), topt),
        VMFNBMixtureFastStep(VMFNBMixtureVAE(label=label), topt),
    ]
    is_spec = lambda v: isinstance(v, P)
    for fast in steps:
        rand = jax.eval_shape(
            lambda k: fast.draw_rand(k, jnp.arange(4), 8),
            jax.random.PRNGKey(0),
        )
        specs = fast.rand_pspecs(P, "data")
        assert (jax.tree_util.tree_structure(
                    specs, is_leaf=is_spec)
                == jax.tree_util.tree_structure(
                    jax.tree_util.tree_map(lambda _: P(), rand),
                    is_leaf=is_spec)), type(fast).__name__
        flat_r = jax.tree_util.tree_leaves(rand)
        flat_s = jax.tree_util.tree_leaves(specs, is_leaf=is_spec)
        for leaf, spec in zip(flat_r, flat_s):
            assert len(spec) <= leaf.ndim, (type(fast).__name__, spec)
            # the sharded axis must be the per-batch ROW axis (size 8)
            ax = spec.index("data")
            assert leaf.shape[ax] == 8, (type(fast).__name__, spec,
                                         leaf.shape)
