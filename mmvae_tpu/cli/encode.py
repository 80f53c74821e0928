"""``encode`` — post-hoc whole-dataset encoding with a trained checkpoint.

The reference has no separate inference binary: latents materialize only
as side effects of training epochs, via the ``visit_vae_model`` scaffold
that no main ever calls (reference: include/mmvae_alg.hh:162-198,
SURVEY §3.5).  This CLI completes the capability: load a checkpoint
written by any of the trainers (``--checkpoint_dir``), sweep the full
dataset once, and write the ``.mu_mean.gz`` / ``.mu_lnvar.gz`` posterior
matrices (plus ``.clust.gz`` for the mixture model).

    python -m mmvae_tpu.cli.encode --model nb --mtx data.mtx.gz \
        --checkpoint ckpt_dir --out encoded
"""

from __future__ import annotations

import argparse
import sys

import jax
import numpy as np

from ..io.index import build_mmutil_index
from ..io.writers import write_data_file
from ..models.nb import NBVAE
from ..models.vmf import VMFVAE
from ..models.vmfnb import VMFNBVAE
from ..data.pipeline import sequential_batches
from ..train.checkpoint import load_checkpoint
from ..train.config import TrainingOptions, _csv_ints
from ..train.loop import make_optimizer
from ..data.block import MtxDataBlock
from ..utils.logging import TLOG
from .common import prepare_blocks  # noqa: F401  (platform override side effect)

import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["nb", "vmf", "vmfnb"], default="nb")
    p.add_argument("--mtx", required=True)
    p.add_argument("--idx", default="")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch_size", type=int, default=100)
    # model shape flags must match the training run
    p.add_argument("--mean_encoding", type=_csv_ints, default=())
    p.add_argument("--mean_decoding", type=_csv_ints, default=())
    p.add_argument("--mean_latent", "--latent", dest="mean_latent", type=int,
                   default=2)
    p.add_argument("--encoding", type=_csv_ints, default=())
    p.add_argument("--decoding", type=_csv_ints, default=())
    p.add_argument("--overdisp_encoding", type=int, default=1)
    p.add_argument("--overdisp_latent", type=int, default=1)
    p.add_argument("--relu", dest="do_relu", action="store_true", default=False)
    ns, _ = p.parse_known_args(argv)

    idx = ns.idx or ns.mtx + ".index"
    if not os.path.exists(idx):
        build_mmutil_index(ns.mtx, idx)
    db = MtxDataBlock(ns.mtx, idx, ns.batch_size)
    D, N = db.nfeature(), db.ntot()

    if ns.model == "nb":
        model = NBVAE(data_dim=D, covar_dim=1,
                      mean_encoding=tuple(ns.mean_encoding),
                      mean_decoding=tuple(ns.mean_decoding),
                      mean_latent=ns.mean_latent,
                      overdisp_encoding=ns.overdisp_encoding,
                      overdisp_latent=ns.overdisp_latent, do_relu=ns.do_relu)
        encode = jax.jit(lambda p, x: model.encode_mu(p, x))
        names = ("mu_mean", "mu_lnvar")
    elif ns.model == "vmf":
        model = VMFVAE(data_dim=D, covar_dim=1, latent=ns.mean_latent,
                       encoding=tuple(ns.encoding),
                       decoding=tuple(ns.decoding), do_relu=ns.do_relu)
        encode = jax.jit(lambda p, x: model.encode(p, x))
        names = ("latent_mean", "latent_lnvar")
    else:
        model = VMFNBVAE(data_dim=D,
                         mean_encoding=tuple(ns.mean_encoding),
                         mean_decoding=tuple(ns.mean_decoding),
                         mean_latent=ns.mean_latent,
                         overdisp_encoding=ns.overdisp_encoding,
                         overdisp_latent=ns.overdisp_latent,
                         do_relu=ns.do_relu)
        encode = jax.jit(lambda p, x: model.shared_encode_mu(p, x))
        names = ("mu_mean", "mu_lnvar")

    params_tmpl = model.init(jax.random.PRNGKey(0))
    opt_tmpl = make_optimizer(TrainingOptions()).init(params_tmpl)
    params, _, epoch, _ = load_checkpoint(ns.checkpoint, params_tmpl, opt_tmpl)
    TLOG(f"Loaded checkpoint at epoch {epoch - 1}")

    mean_out = None
    lnvar_out = None
    for batch in sequential_batches(N, ns.batch_size):
        db.clear()
        x = db.read(batch)
        mean, lnvar = encode(params, x)
        mean, lnvar = np.asarray(mean), np.asarray(lnvar)
        if mean_out is None:
            mean_out = np.zeros((N, mean.shape[1]), np.float32)
            lnvar_out = np.zeros((N, lnvar.shape[1]), np.float32)
        ok = batch < N
        mean_out[batch[ok]] = mean[ok]
        lnvar_out[batch[ok]] = lnvar[ok]

    write_data_file(f"{ns.out}.{names[0]}.gz", mean_out)
    write_data_file(f"{ns.out}.{names[1]}.gz", lnvar_out)
    TLOG("Done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
