"""Fixed-seed ELBO trajectory regression (golden values, CPU).

Pins the exact per-epoch reported losses of a small deterministic
training run.  Any change to model formulas, the PRNG schedule, the
optimizer chain, or the loss functions shows up here — the guard the
reference never had (SURVEY §4).
"""

import numpy as np

import jax

from mmvae_tpu.models.nb import NBVAE
from mmvae_tpu.ops.losses import nb_loss
from mmvae_tpu.train.config import TrainingOptions
from mmvae_tpu.train.loop import Trainer
from tests.conftest import make_count_matrix

# generated once on the CPU backend (jax 0.9.0); loose-ish rtol tolerates
# compiler-version reassociation, tight enough to catch semantic drift
GOLDEN = [148.8197, 135.7637, 126.3333, 116.5262]


def test_fixed_seed_trajectory():
    rng = np.random.default_rng(42)
    rr, cc, vv, dens = make_count_matrix(rng, 40, 120)
    x_all = dens.T
    B = 24
    batches = np.stack([(np.arange(B) + b * B) % 120 for b in range(5)])
    x_sb = np.stack([x_all[b] for b in batches]).astype(np.float32)
    c_sb = np.ones((5, B, 1), np.float32)

    model = NBVAE(data_dim=40, covar_dim=1)
    params = model.init(jax.random.PRNGKey(0))
    topt = TrainingOptions(nboot=3, superbatch=5, seed=0)
    tr = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, o, b: nb_loss(x, o, b), topt,
    )
    s = tr.optimizer.init(params)
    losses = []
    for epoch in range(4):
        params, s, rep = tr.step(params, s, x_sb, c_sb, epoch, np.arange(5))
        losses.append(float(np.asarray(rep).mean()))
    np.testing.assert_allclose(losses, GOLDEN, rtol=1e-3)
