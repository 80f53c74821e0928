"""``vmfnb_vae`` — joint vMF + NB VAE trainer CLI.

The reference ships this model as headers only with a disabled driver
(src/backup/vmfnb_vae_main.cc — body commented out and excluded from the
build).  This CLI completes the capability: without ``--annot`` it
trains the shared-encoder joint model (include/models/vmfnb.hh); with
``--annot`` + ``--row`` it trains the labeled-mixture variant
(include/models/vmfnb_mixture.hh) and additionally writes the
``.clust.gz`` assignment artifact.
"""

from __future__ import annotations

import sys

import jax

import numpy as np

from ..data.annotation import Annotation
from ..models.vmfnb import VMFNBVAE, vmfnb_composite_loss
from ..models.vmfnb_mixture import VMFNBMixtureVAE, mixture_composite_loss
from ..train.checkpoint import load_checkpoint, save_checkpoint
from ..train.config import MMVaeOptions, TrainingOptions, _csv_ints
from ..train.loop import make_optimizer, train_vae_model
from ..train.recorder import LatentRecorder
from ..io.writers import write_vector_file
from ..utils.logging import TLOG
from .common import (
    add_relu_flags,
    compose_parsers,
    host_role,
    multihost_setup,
    prepare_blocks,
    warn_unknown_args,
)

_MODEL_DESC = "Joint von Mises-Fisher + Negative Binomial VAE"


def resolve_kappa_defaults(kmin, kmax, mixture):
    """Reference ctor defaults differ by mode: joint = .1/10.
    (vmfnb.hh:76-77), mixture = .1/100. (vmfnb_mixture.hh:74-75)."""
    if kmin is None:
        kmin = 0.1
    if kmax is None:
        kmax = 100.0 if mixture else 10.0
    return kmin, kmax


def _model_args(g) -> None:
    """Reference flags: vmfnb.hh:93-235 (adds --vmf_decoding)."""
    g.add_argument("--mean_encoding", "--mean-encoding", type=_csv_ints,
                   default=())
    g.add_argument("--mean_decoding", "--mean-decoding", type=_csv_ints,
                   default=())
    g.add_argument("--vmf_decoding", "--vmf-decoding", type=_csv_ints,
                   default=())
    g.add_argument("--mean_latent", "--mean-latent", type=int, default=2)
    g.add_argument("--overdisp_encoding", "--overdisp-encoding",
                   "--overdispersion_encoding", "--overdispersion-encoding",
                   dest="overdisp_encoding", type=int, default=1)
    g.add_argument("--overdisp_latent", "--overdispersion_latent",
                   "--overdispersion-latent", dest="overdisp_latent",
                   type=int, default=1)
    # reference defaults differ by mode (vmfnb.hh:76-77 joint = .1/10.,
    # vmfnb_mixture.hh:74-75 mixture = .1/100.); None = pick per mode
    g.add_argument("--kappa_min", "--kappa-min", type=float, default=None)
    g.add_argument("--kappa_max", "--kappa-max", type=float, default=None)
    add_relu_flags(g)


def main(argv=None) -> int:
    parser = compose_parsers(_MODEL_DESC, _model_args)
    ns, _unknown = parser.parse_known_args(argv)
    warn_unknown_args(_unknown)

    opts = MMVaeOptions.from_args(ns)
    topt = TrainingOptions.from_args(ns)
    topt.apply_runtime_config()

    local_b, host_kw = multihost_setup(opts, topt)
    data_block, covar_block = prepare_blocks(opts, local_batch=local_b)
    D = data_block.nfeature()

    mixture = bool(opts.annot)
    TLOG("Constructing a model" + (" (labeled mixture)" if mixture else ""))

    ns.kappa_min, ns.kappa_max = resolve_kappa_defaults(
        ns.kappa_min, ns.kappa_max, mixture
    )

    if mixture:
        if not opts.row:
            raise ValueError("--annot requires --row (the feature list)")
        ann = Annotation(opts.annot, opts.row)
        L = ann.matrix()
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
            kappa_min=ns.kappa_min,
            kappa_max=ns.kappa_max,
            do_relu=ns.do_relu,
        )
        dd = model.dd

        def forward(p, x, c, key, training):
            return model.forward(p, x, key, training)

        def loss_fn(x, out, beta):
            return mixture_composite_loss(x, out, beta, dd)

        # The reference records with the model FROZEN
        # (model->train(false), vmfnb_mixture.hh:741-795): the vMF latent
        # is a hard Gumbel one-hot draw (:692-695), taken with a fixed
        # key so recording is deterministic.
        _record_key = jax.random.PRNGKey(topt.seed)

        def encode_fn(p, x):
            vmf = model.vmf_forward(p, x, _record_key, False)
            return model.nb_encode_mu(p, x, vmf.latent)

        def extra_fn(p, x):
            vmf = model.vmf_forward(p, x, _record_key, False)
            return vmf.latent

        def combined_fn(p, x):
            # one E-step for both outputs on the host recording path
            vmf = model.vmf_forward(p, x, _record_key, False)
            return model.nb_encode_mu(p, x, vmf.latent), vmf.latent

        recorder = LatentRecorder(
            opts.out, topt.max_epoch, data_block.ntot(),
            encode_fn=encode_fn, extra_fn=extra_fn, extra_name="clust",
            async_writes=True, combined_fn=combined_fn,
        )

        # TP recording at training cost: the same frozen E-step over
        # model-axis shards (psum'd mixture logits)
        def tp_encode_rec(p, x):
            vmf = model.tp_vmf_forward(p, x, _record_key, False, "model")
            return model.tp_nb_encode_mu(p, x, vmf.latent, "model")

        def tp_extra_rec(p, x):
            vmf = model.tp_vmf_forward(p, x, _record_key, False, "model")
            return vmf.latent

        tp_rec_kw = dict(tp_record_encode=tp_encode_rec,
                         tp_record_extra=tp_extra_rec)
    else:
        model = VMFNBVAE(
            data_dim=D,
            mean_encoding=tuple(ns.mean_encoding),
            mean_decoding=tuple(ns.mean_decoding),
            vmf_decoding=tuple(ns.vmf_decoding),
            mean_latent=ns.mean_latent,
            overdisp_encoding=ns.overdisp_encoding,
            overdisp_latent=ns.overdisp_latent,
            kappa_min=ns.kappa_min,
            kappa_max=ns.kappa_max,
            do_relu=ns.do_relu,
        )

        def forward(p, x, c, key, training):
            return model.forward(p, x, key, training)

        def loss_fn(x, out, beta):
            return vmfnb_composite_loss(x, out, beta)

        recorder = LatentRecorder(
            opts.out, topt.max_epoch, data_block.ntot(),
            encode_fn=lambda p, x: model.shared_encode_mu(p, x),
            async_writes=True,
        )
        tp_rec_kw = dict(
            tp_record_encode=lambda p, x: model.tp_shared_encode_mu(
                p, x, "model"
            ),
        )

    params = model.init(jax.random.PRNGKey(topt.seed))

    start_epoch = 0
    init_opt_state = None
    prev_losses: list[float] = []
    if topt.resume:
        # the TP trainer uses the clipless chain; the template must match
        opt_state_tmpl = make_optimizer(
            topt, tp=topt.tensor_parallel > 1
        ).init(params)
        params, init_opt_state, start_epoch, prev_losses = load_checkpoint(
            topt.resume, params, opt_state_tmpl
        )
        TLOG(f"Resumed from {topt.resume} at epoch {start_epoch}")

    _, _primary = host_role()

    def on_epoch_end(epoch, p, o, losses):
        if topt.checkpoint_dir and _primary:
            save_checkpoint(topt.checkpoint_dir, p, o, epoch, topt.seed,
                            prev_losses + losses)

    mesh = None
    tp_kw = {}
    tp = max(1, topt.tensor_parallel)
    if tp > 1:
        from ..parallel.mesh import make_mesh

        if D % tp:
            raise ValueError(
                f"--tensor_parallel {tp} must divide the feature dim {D}"
            )
        if not (topt.fused and topt.fused_step and model._can_fuse_step()):
            raise ValueError(
                "--tensor_parallel needs the fused step path "
                "(direct mu decoder, --fused_step)"
            )
        mesh = make_mesh(model_parallel=tp)
        tp_kw = dict(tp_shard_map=True, data_dim=D,
                     tp_param_pspecs=model.tp_pspecs(params),
                     **tp_rec_kw)
    elif topt.data_parallel or topt.dp_shard or host_kw:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()

    def _mixture_perm_apply(model, fused_kw):
        """Feature-clustering hook for the mixture model: its D-indexed
        CONSTANTS live outside the params tree, so the training loop
        calls this with the permutation it applied to data+params.
        The label ndarray mutates in place (the model re-reads it at
        trace time, as does ``_filter()``); the fast step's packed
        caches rebind."""
        def apply(perm):
            lab = np.asarray(model.label)
            lab[...] = lab[perm]
            fs = fused_kw.get("fast_step")
            if fs is not None and hasattr(fs, "_label"):
                fs._label = fs._label[:, perm]
                fs._filt = fs._filt[:, perm]

        return apply

    # Fused step path (default): the NB half (direct decoder +
    # likelihood) runs in the single-pass Pallas kernels (joint variant
    # of ops/nb_step.py); the vMF half stays in XLA.  --no_fused_step
    # opts out; hidden mu decoders fall back automatically.
    fused_kw = {}
    if tp_kw:
        # TP-aware fused step: D-sharded joint kernels + sharded vMF
        # (works for both the joint and the mixture model)
        fused_kw = dict(
            report_loss_override=lambda p, x, c, k, b: (
                model.fused_step_report_tp(p, x, c, k, b)
            ),
            boot_loss_override=lambda p, x, c, k, b: (
                model.fused_step_boot_tp(p, x, c, k, b, need_value=False)
            ),
        )
    elif topt.fused and topt.fused_step and model._can_fuse_step():
        fused_kw = dict(
            report_loss_override=lambda p, x, c, k, b: (
                model.fused_step_report(p, x, c, k, b,
                                        include_data_const=True)
            ),
            boot_loss_override=lambda p, x, c, k, b: (
                model.fused_step_boot(p, x, c, k, b, need_value=False)
            ),
        )
        # v3 packed-parameter step (ops/vmfnb_fast.py) on top of the
        # joint kernels: hoisted data views, collapsed vMF contractions
        from ..ops.vmfnb_fast import VMFNBFastStep, VMFNBMixtureFastStep

        for fast_cls in (VMFNBFastStep, VMFNBMixtureFastStep):
            if fast_cls.supports(model):
                fused_kw["fast_step"] = fast_cls(
                    model, topt,
                    kl=(opts.kl_max, opts.kl_min, opts.kl_discount),
                )
                break

    if _primary:
        # reference parity: model->pretty_print(std::cerr) at train
        # start (mmvae_alg.hh:238)
        from ..utils.summary import pretty_print

        pretty_print(model, params)
    params, scores = train_vae_model(
        forward, recorder, data_block, covar_block, topt, loss_fn, params,
        kl=(opts.kl_max, opts.kl_min, opts.kl_discount),
        mesh=mesh,
        dp_shard_map=topt.dp_shard,
        start_epoch=start_epoch,
        init_opt_state=init_opt_state,
        # None when checkpointing is off: a live per-epoch callback
        # forces the loop's per-epoch device sync (it would see
        # stale loss_vec under the batched loss fetch)
        on_epoch_end=on_epoch_end if topt.checkpoint_dir else None,
        metrics_path=(opts.out + ".metrics.jsonl") if _primary else None,
        ondevice=topt.ondevice,
        # dense-resident kernel runs cluster hot genes into the tail
        # lane tiles.  Joint: all D-indexed state lives in params.
        # Mixture: the (D, K) annotation matrix and the fast step's
        # (K, D)/(1, D) caches are constants outside the params tree —
        # the hook below permutes them in place alongside the data.
        feature_perm=True,
        feature_perm_apply=(_mixture_perm_apply(model, fused_kw)
                            if mixture else None),
        **fused_kw,
        **host_kw,
        **tp_kw,
    )

    if _primary:
        write_vector_file(opts.out + ".scores.gz", prev_losses + scores)
    TLOG("Done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
