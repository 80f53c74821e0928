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
from ..train.config import _csv_ints
from ..data.block import MtxDataBlock
from ..utils.logging import TLOG
from .common import prepare_blocks  # noqa: F401  (platform override side effect)
from .common import warn_unknown_args

import os


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["nb", "vmf", "vmfnb", "mixture"],
                   default="nb")
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
    # mixture model needs the annotation surface + the recording key
    p.add_argument("--annot", default="")
    p.add_argument("--row", default="")
    p.add_argument("--kappa_min", type=float, default=1.0)
    p.add_argument("--kappa_max", type=float, default=100.0)
    p.add_argument("--seed", type=int, default=0)
    ns, _unknown = p.parse_known_args(argv)
    warn_unknown_args(_unknown)

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
    elif ns.model == "vmfnb":
        model = VMFNBVAE(data_dim=D,
                         mean_encoding=tuple(ns.mean_encoding),
                         mean_decoding=tuple(ns.mean_decoding),
                         mean_latent=ns.mean_latent,
                         overdisp_encoding=ns.overdisp_encoding,
                         overdisp_latent=ns.overdisp_latent,
                         do_relu=ns.do_relu)
        encode = jax.jit(lambda p, x: model.shared_encode_mu(p, x))
        names = ("mu_mean", "mu_lnvar")
    else:  # labeled mixture: also writes .clust.gz
        from ..data.annotation import Annotation
        from ..models.vmfnb_mixture import VMFNBMixtureVAE

        if not (ns.annot and ns.row):
            raise ValueError("--model mixture needs --annot and --row")
        L = Annotation(ns.annot, ns.row).matrix()
        if L.shape[0] != D:
            raise ValueError(
                f"annotation covers {L.shape[0]} features but data has {D}"
            )
        model = VMFNBMixtureVAE(
            label=L,
            mean_encoding=tuple(ns.mean_encoding),
            mean_decoding=tuple(ns.mean_decoding),
            mean_latent=ns.mean_latent,
            overdisp_encoding=ns.overdisp_encoding,
            overdisp_latent=ns.overdisp_latent,
            kappa_min=ns.kappa_min, kappa_max=ns.kappa_max,
            do_relu=ns.do_relu,
        )
        # frozen-model recording semantics: hard Gumbel one-hot with the
        # deterministic seed key (vmfnb_mixture.hh:680-696, 741-795)
        _rkey = jax.random.PRNGKey(ns.seed)

        def _enc(p, x):
            vmf = model.vmf_forward(p, x, _rkey, False)
            return model.nb_encode_mu(p, x, vmf.latent), vmf.latent

        encode_with_clust = jax.jit(_enc)
        encode = None  # the batch loop always uses encode_with_clust here
        names = ("mu_mean", "mu_lnvar")

    params_tmpl = model.init(jax.random.PRNGKey(0))
    # params-only load: works for checkpoints from ANY optimizer config
    params, _, epoch, _ = load_checkpoint(ns.checkpoint, params_tmpl)
    TLOG(f"Loaded checkpoint at epoch {epoch - 1}")

    mean_out = None
    lnvar_out = None
    clust_out = None
    for batch in sequential_batches(N, ns.batch_size):
        db.clear()
        x = db.read(batch)
        clust = None
        if ns.model == "mixture":
            (mean, lnvar), clust = encode_with_clust(params, x)
        else:
            mean, lnvar = encode(params, x)
        mean, lnvar = np.asarray(mean), np.asarray(lnvar)
        if mean_out is None:
            mean_out = np.zeros((N, mean.shape[1]), np.float32)
            lnvar_out = np.zeros((N, lnvar.shape[1]), np.float32)
        ok = batch < N
        mean_out[batch[ok]] = mean[ok]
        lnvar_out[batch[ok]] = lnvar[ok]
        if clust is not None:
            clust = np.asarray(clust)
            if clust_out is None:
                clust_out = np.zeros((N, clust.shape[1]), np.float32)
            clust_out[batch[ok]] = clust[ok]

    write_data_file(f"{ns.out}.{names[0]}.gz", mean_out)
    write_data_file(f"{ns.out}.{names[1]}.gz", lnvar_out)
    if clust_out is not None:
        write_data_file(f"{ns.out}.clust.gz", clust_out)
    TLOG("Done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
