"""``nb_vae`` — negative binomial VAE trainer CLI.

Reimplements the full pipeline of the reference binary
(src/nb_vae_main.cc:39-133): parse the three option groups, auto-build
indexes and covariates, construct the model, train with KL annealing,
and dump ``${out}.scores.gz`` plus per-epoch latent/parameter artifacts.
"""

from __future__ import annotations

import sys

import jax

from ..models.nb import NBVAE
from ..ops.losses import nb_loss
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

_MODEL_DESC = r"""[Likelihood]

        Gamma(x + nu)      mu           nu
f(x) = -------------- ( ------- )^x ( ------- )^nu
       Gamma(x+1)Gamma(nu)  mu + nu      mu + nu

mu = exp(decoding(z_mu) + bias_mu)
nu = exp(decoding(z_nu) + bias_nu)
"""


def _model_args(g) -> None:
    """Reference flags: nb.hh:77-112 (with the same aliases)."""
    g.add_argument("--mean_encoding", "--mean-encoding", type=_csv_ints,
                   default=())
    g.add_argument("--mean_decoding", "--mean-decoding", type=_csv_ints,
                   default=())
    g.add_argument("--mean_latent", "--mean-latent", type=int, default=2)
    g.add_argument("--overdisp_encoding", "--overdisp-encoding",
                   "--overdispersion_encoding", "--overdispersion-encoding",
                   dest="overdisp_encoding", type=int, default=1)
    g.add_argument("--overdisp_latent", "--overdispersion_latent",
                   "--overdispersion-latent", dest="overdisp_latent",
                   type=int, default=1)
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

    TLOG("Constructing a model")
    model = NBVAE(
        data_dim=data_block.nfeature(),
        covar_dim=covar_block.nfeature(),
        mean_encoding=tuple(ns.mean_encoding),
        mean_decoding=tuple(ns.mean_decoding),
        mean_latent=ns.mean_latent,
        overdisp_encoding=ns.overdisp_encoding,
        overdisp_latent=ns.overdisp_latent,
        do_relu=ns.do_relu,
    )
    params = model.init(jax.random.PRNGKey(topt.seed))

    recorder = LatentRecorder(
        opts.out, topt.max_epoch, data_block.ntot(),
        encode_fn=lambda p, x: model.encode_mu(p, x),
        mean_name="mu_mean", lnvar_name="mu_lnvar",
        async_writes=True,
    )

    def forward(p, x, c, key, training):
        return model.forward(p, x, c, key, training)

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

        D = data_block.nfeature()
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
                     # TP recording at training cost: encode_mu over
                     # model-axis shards (psum'd D->H first layer)
                     tp_record_encode=lambda p, x: model.tp_encode_mu(
                         p, x, None, "model"))
    elif topt.data_parallel or topt.dp_shard or host_kw:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()

    TLOG("Training the model...")
    if jax.process_index() == 0:
        # reference parity: model->pretty_print(std::cerr) at train
        # start (mmvae_alg.hh:238)
        from ..utils.summary import pretty_print

        pretty_print(model, params)
    # Fused kernel paths (default): --no_fused_step drops to the v1
    # fused ELBO kernel (decoder + likelihood in one Pallas kernel);
    # --no_fused falls back to plain XLA.  The v2 single-pass step
    # kernels (ops/nb_step.py: in-kernel logits, fused value+grad)
    # require a direct mu decoder; otherwise v1 is used automatically.
    fused_kw = {}
    if tp_kw:
        # TP-aware fused step: D-sharded kernels with psum'd normalizers
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
        # v3 packed-parameter step (ops/nb_fast.py) on top of the v2
        # kernels: batch-hoisted encoder + fused optimizer updates
        from ..ops.nb_fast import NBFastStep

        if NBFastStep.supports(model):
            fused_kw["fast_step"] = NBFastStep(
                model, topt,
                kl=(opts.kl_max, opts.kl_min, opts.kl_discount),
            )
    elif topt.fused:
        fused_kw = dict(
            report_loss_override=lambda p, x, c, k, b: model.fused_loss(
                p, x, c, k, b, True, include_data_const=True
            ),
            boot_loss_override=lambda p, x, c, k, b: model.fused_loss(
                p, x, c, k, b, True, include_data_const=False
            ),
        )

    params, scores = train_vae_model(
        forward, recorder, data_block, covar_block, topt,
        lambda x, out, beta: nb_loss(x, out, beta),
        params,
        # gradient steps skip the lgamma(x+1) data constant (same grads)
        boot_loss_fn=lambda x, out, beta: nb_loss(
            x, out, beta, include_data_const=False
        ),
        **fused_kw,
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
        # lane tiles (artifacts stay in input order); safe for NB —
        # no model-side D-indexed constants outside the params
        feature_perm=True,
        **host_kw,
        **tp_kw,
    )

    if _primary:
        write_vector_file(opts.out + ".scores.gz", prev_losses + scores)
    TLOG("Done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
