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
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="shard the feature axis D over N devices for "
                        "the dense-resident sweep (the same kernel-"
                        "aware 'model'-axis layout as training TP); "
                        "spare devices form a data axis over batch "
                        "blocks.  1 = single-device serving.")
    p.add_argument("--chunk_batches", type=int, default=16,
                   help="batches encoded per device dispatch (lax.map "
                        "inside one jit); amortizes the per-dispatch "
                        "host<->device round trip, which dominates on "
                        "remote/tunneled devices.  1 = one dispatch per "
                        "batch (the legacy behavior).")
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
    # None = reference per-mode defaults (resolve_kappa_defaults)
    p.add_argument("--kappa_min", type=float, default=None)
    p.add_argument("--kappa_max", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    ns, _unknown = p.parse_known_args(argv)
    warn_unknown_args(_unknown)
    from .vmfnb_vae import resolve_kappa_defaults

    ns.kappa_min, ns.kappa_max = resolve_kappa_defaults(
        ns.kappa_min, ns.kappa_max, ns.model == "mixture"
    )

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
        batch_fn = lambda p, x: model.encode_mu(p, x)  # noqa: E731
        names = ("mu_mean", "mu_lnvar")
    elif ns.model == "vmf":
        model = VMFVAE(data_dim=D, covar_dim=1, latent=ns.mean_latent,
                       encoding=tuple(ns.encoding),
                       decoding=tuple(ns.decoding), do_relu=ns.do_relu)
        batch_fn = lambda p, x: model.encode(p, x)  # noqa: E731
        names = ("latent_mean", "latent_lnvar")
    elif ns.model == "vmfnb":
        model = VMFNBVAE(data_dim=D,
                         mean_encoding=tuple(ns.mean_encoding),
                         mean_decoding=tuple(ns.mean_decoding),
                         mean_latent=ns.mean_latent,
                         overdisp_encoding=ns.overdisp_encoding,
                         overdisp_latent=ns.overdisp_latent,
                         do_relu=ns.do_relu)
        batch_fn = lambda p, x: model.shared_encode_mu(p, x)  # noqa: E731
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

        def batch_fn(p, x):
            vmf = model.vmf_forward(p, x, _rkey, False)
            mean, lnvar = model.nb_encode_mu(p, x, vmf.latent)
            return mean, lnvar, vmf.latent

        names = ("mu_mean", "mu_lnvar")

    # TP serving: the per-batch encode over model-axis feature shards,
    # mirroring the training loop's in-scan TP record functions (psum'd
    # normalizers; outputs replicated across 'model')
    tp = max(1, ns.tensor_parallel)
    tp_batch_fn = None
    if tp > 1:
        if ns.model == "nb":
            tp_batch_fn = lambda p, x: model.tp_encode_mu(  # noqa: E731
                p, x, None, "model")
        elif ns.model == "vmf":
            tp_batch_fn = lambda p, x: model.tp_encode(  # noqa: E731
                p, x, None, "model")
        elif ns.model == "vmfnb":
            tp_batch_fn = lambda p, x: model.tp_shared_encode_mu(  # noqa: E731
                p, x, "model")
        else:
            def tp_batch_fn(p, x):
                vmf = model.tp_vmf_forward(p, x, _rkey, False, "model")
                mean, lnvar = model.tp_nb_encode_mu(
                    p, x, vmf.latent, "model")
                return mean, lnvar, vmf.latent

    params_tmpl = model.init(jax.random.PRNGKey(0))
    # params-only load: works for checkpoints from ANY optimizer config
    params, _, epoch, _ = load_checkpoint(ns.checkpoint, params_tmpl)
    TLOG(f"Loaded checkpoint at epoch {epoch - 1}")

    batches = sequential_batches(N, ns.batch_size)
    chunk = max(1, ns.chunk_batches)
    mean_out = None
    lnvar_out = None
    clust_out = None

    # Serving fast path: when N x D fits the dense budget (same
    # MMVAE_DENSE_BYTES gate as training), load the counts ON DEVICE
    # ONCE in the narrowest integer dtype and slice batches there —
    # the streaming path below transfers ~N x D x 4 bytes of f32
    # batches host->device (8 GB at the north star, ~200 s over the
    # tunnel) where the resident path transfers the 2 GB int8 matrix
    # once and is device-bound afterwards.
    dense_budget = int(os.environ.get("MMVAE_DENSE_BYTES", 6 << 30))
    from ..train.loop import _as_memory_block, _build_dense

    # cheap pre-check before the whole-file CSC read: even at 1
    # byte/count (int8, the narrowest possible) an over-budget N x D
    # can never densify, so skip building the memory block entirely
    dense_ok = N % ns.batch_size == 0 and 0 < N * D <= dense_budget
    if N % ns.batch_size != 0:
        TLOG(f"resident fast path skipped: N={N} not divisible by "
             f"--batch_size {ns.batch_size} (pick a divisor batch size "
             f"for the fast sweep)")
    elif not dense_ok:
        TLOG(f"resident fast path skipped: N*D={N * D / 1e6:,.0f} MB "
             f"at 1 byte/count exceeds MMVAE_DENSE_BYTES="
             f"{dense_budget / 1e6:,.0f} MB")
    if dense_ok:
        blk = _as_memory_block(db)
        vd = getattr(blk, "val_dtype", np.float32)
        dense_ok = N * D * np.dtype(vd).itemsize <= dense_budget
        if not dense_ok:
            TLOG(f"resident fast path skipped: {np.dtype(vd).name} "
                 f"matrix is {N * D * np.dtype(vd).itemsize / 1e6:,.0f} "
                 f"MB > MMVAE_DENSE_BYTES={dense_budget / 1e6:,.0f} MB")
    if dense_ok:
        import time

        import jax.numpy as jnp

        TLOG(f"Loading data on device (dense-resident, "
             f"{N * D * np.dtype(vd).itemsize / 1e6:,.0f} MB "
             f"{np.dtype(vd).name})")
        data_dense = _build_dense(blk)
        Bsz = ns.batch_size
        nbatch = N // Bsz

        if tp > 1 and D % tp != 0:
            TLOG(f"TP serving skipped: D={D} not divisible by "
                 f"--tensor_parallel {tp}; running single-device")
            tp = 1
        if tp > 1:
            # TP sweep: one shard_map over a ('data', 'model') mesh.
            # Features shard over 'model' (the training TP layout,
            # model.tp_pspecs); whole batches block-shard over 'data'
            # (shard s owns batches [s*nb_loc, (s+1)*nb_loc)), so the
            # gathered (nbatch, Bsz, Z) stack is already in input row
            # order.  Outputs are replicated over 'model' by the psum
            # inside the tp_* encode fns.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import make_mesh

            ndev = len(jax.devices())
            if ndev % tp != 0:
                raise ValueError(
                    f"--tensor_parallel {tp} does not divide "
                    f"{ndev} devices")
            import math

            dp = math.gcd(ndev // tp, nbatch)
            mesh = make_mesh(model_parallel=tp,
                             devices=np.asarray(
                                 jax.devices()[: dp * tp]))
            nb_loc = nbatch // dp
            TLOG(f"TP serving over (data={dp}, model={tp}); "
                 f"{nb_loc} batches/shard")
            if dp * tp < ndev:
                TLOG(f"note: {ndev - dp * tp} of {ndev} devices idle "
                     f"(data axis = gcd(spare devices, nbatch="
                     f"{nbatch})); pick a batch count divisible by "
                     f"{ndev // tp} to use all devices")

            def sweep(p, data):
                # shard-local: data is (N/dp, D/tp)
                def body(b):
                    x = jax.lax.dynamic_slice_in_dim(
                        data, b * Bsz, Bsz, 0
                    ).astype(jnp.float32)
                    return tp_batch_fn(p, x)

                return jax.lax.map(body, jnp.arange(nb_loc))

            n_out = 3 if ns.model == "mixture" else 2
            sweep_sh = jax.shard_map(
                sweep, mesh=mesh,
                in_specs=(model.tp_pspecs(params), P("data", "model")),
                out_specs=tuple(P("data", None, None)
                                for _ in range(n_out)),
                check_vma=False,
            )
            data_dense = jax.device_put(
                data_dense, NamedSharding(mesh, P("data", "model")))
            # pin params on device in their TP layout BEFORE the timed
            # call: the AOT executable would otherwise transfer the
            # host numpy leaves synchronously per invocation (measured
            # ~20 s over a tunneled device vs 0.14 s device-resident)
            params = jax.device_put(
                params,
                jax.tree_util.tree_map(
                    lambda s: NamedSharding(mesh, s),
                    model.tp_pspecs(params),
                    is_leaf=lambda x: isinstance(x, P)),
            )
            compiled = jax.jit(sweep_sh).lower(
                params, data_dense).compile()
        else:
            def sweep(p, data):
                # data rides as an ARGUMENT: closing over it would bake
                # the 2 GB matrix into the lowered program as a constant
                def body(b):
                    x = jax.lax.dynamic_slice_in_dim(
                        data, b * Bsz, Bsz, 0
                    ).astype(jnp.float32)
                    return batch_fn(p, x)

                return jax.lax.map(body, jnp.arange(nbatch))

            # device-resident params before the timed call (see the TP
            # branch note: host numpy args stall the AOT executable on
            # per-invocation synchronous transfers over remote devices).
            # NOTE: block_until_ready hangs over tunneled devices
            # (CLAUDE.md) — force with tiny fetches instead.
            params = jax.device_put(params)
            jax.tree_util.tree_map(
                lambda a: np.asarray(a.ravel()[:1]), params)
            compiled = jax.jit(sweep).lower(params, data_dense).compile()
        # ONE dispatch for the whole dataset, one fetch per output —
        # the exact shape of a training epoch's recording scan.  AOT
        # compile first so the timed (and only) execution excludes
        # compilation without running the sweep twice.
        t0 = time.time()
        outs_dev = compiled(params, data_dense)
        outs = [np.asarray(o) for o in outs_dev]
        dt = time.time() - t0
        mode = "dense-resident" if tp == 1 else (
            f"dense-resident, TP model={tp}")
        TLOG(f"Encoded {N} cells in {dt:.3f}s "
             f"({N / dt:,.0f} cells/sec, {mode})")
        mean_out = outs[0].reshape(N, -1)
        lnvar_out = outs[1].reshape(N, -1)
        if len(outs) == 3:
            clust_out = outs[2].reshape(N, -1)
    else:
        if tp > 1:
            TLOG("TP serving needs the dense-resident sweep; "
                 "streaming path runs single-device")
        # Chunked streaming sweep: ``chunk_batches`` batches ride ONE
        # jitted ``lax.map`` dispatch and ONE device->host fetch.
        # Per-batch results are identical to the one-dispatch-per-batch
        # loop (the map body is the same per-batch graph; the mixture's
        # frozen Gumbel key is per batch either way) while the
        # host<->device round-trip count drops by the chunk factor —
        # the loop is RTT-bound on tunneled devices (~27 ms each way).
        run_chunk = jax.jit(
            lambda p, xs: jax.lax.map(lambda x: batch_fn(p, x), xs))
        for i in range(0, len(batches), chunk):
            grp = batches[i:i + chunk]
            # keep ONE compiled shape: a ragged final group would
            # otherwise trigger a second full XLA compile of the map
            # sweep (slow over the remote-compile tunnel) — pad with the
            # last batch's rows; the write-back loop below only
            # consumes len(grp) slots
            width = chunk if i > 0 else len(grp)
            xs = np.empty((width, ns.batch_size, D), np.float32)
            for j, batch in enumerate(grp):
                db.clear()
                xs[j] = db.read(batch)
            for j in range(len(grp), width):
                xs[j] = xs[len(grp) - 1]
            outs = [np.asarray(o) for o in run_chunk(params, xs)]
            mean, lnvar = outs[0], outs[1]
            if mean_out is None:
                mean_out = np.zeros((N, mean.shape[2]), np.float32)
                lnvar_out = np.zeros((N, lnvar.shape[2]), np.float32)
                if len(outs) == 3:
                    clust_out = np.zeros((N, outs[2].shape[2]), np.float32)
            for j, batch in enumerate(grp):
                # sequential_batches wraps modulo N, so every index is
                # valid; wrapped duplicates rewrite identical rows.
                mean_out[batch] = mean[j]
                lnvar_out[batch] = lnvar[j]
                if clust_out is not None:
                    clust_out[batch] = outs[2][j]

    write_data_file(f"{ns.out}.{names[0]}.gz", mean_out)
    write_data_file(f"{ns.out}.{names[1]}.gz", lnvar_out)
    if clust_out is not None:
        write_data_file(f"{ns.out}.clust.gz", clust_out)
    TLOG("Done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
