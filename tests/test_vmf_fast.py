"""v3 packed fast step for the vMF model (ops/vmf_fast.py) vs the
generic forward/loss path.

Same contract as tests/test_nb_fast.py: identical PRNG draws,
trajectories equal up to float reassociation from the hoisted views and
the hoisted encoder/normalizer algebra.
"""

import numpy as np
import pytest

import jax

from mmvae_tpu.models.vmf import VMFVAE
from mmvae_tpu.ops.losses import vmf_loss
from mmvae_tpu.ops.vmf_fast import VMFFastStep
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import Trainer


def _mk_data(S=2, B=8, D=640, seed=3, dtype=np.int16):
    rng = np.random.default_rng(seed)
    x = rng.poisson(0.7, size=(S, B, D)).astype(dtype)
    c = np.ones((S, B, 1), np.float32)
    return x, c


def _make_trainer(model, topt, fast):
    kw = {}
    if fast:
        kw["fast_step"] = VMFFastStep(model, topt)
    return Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: vmf_loss(x, o, b),
        topt,
        **kw,
    )


def test_vmf_pack_unpack_roundtrip():
    model = VMFVAE(data_dim=640, covar_dim=1, latent=3)
    params = model.init(jax.random.PRNGKey(1))
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    fast = VMFFastStep(model, topt)
    back = fast.unpack(fast.pack(params))
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


@pytest.mark.parametrize("dtype", [np.int16, np.float32])
@pytest.mark.parametrize("do_relu", [False, True])
def test_vmf_fast_matches_generic_trajectory(dtype, do_relu):
    model = VMFVAE(data_dim=640, covar_dim=1, latent=2, do_relu=do_relu)
    topt = TrainingOptions(nboot=3, superbatch=2, seed=0)
    x, c = _mk_data(dtype=dtype)

    results = []
    for fast in (False, True):
        tr = _make_trainer(model, topt, fast)
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
                                   rtol=3e-3, atol=1e-4,
                                   err_msg=str(path))


def test_vmf_fast_int_float_invariance():
    model = VMFVAE(data_dim=640, covar_dim=1, latent=2)
    topt = TrainingOptions(nboot=2, superbatch=2, seed=0)
    xi, c = _mk_data(dtype=np.int16)
    xf = xi.astype(np.float32)
    outs = []
    for x in (xi, xf):
        tr = _make_trainer(model, topt, fast=True)
        params = model.init(jax.random.PRNGKey(0))
        s = tr.optimizer.init(params)
        params, s, rep = tr.step(params, s, x, c, 0, np.arange(2))
        outs.append(np.asarray(rep))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_vmf_fast_supports_gate():
    assert VMFFastStep.supports(VMFVAE(data_dim=64, covar_dim=1))
    assert not VMFFastStep.supports(
        VMFVAE(data_dim=64, covar_dim=1, encoding=(16,))
    )
    assert not VMFFastStep.supports(
        VMFVAE(data_dim=64, covar_dim=1, decoding=(16,))
    )
