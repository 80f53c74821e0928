"""``vmf_vae`` — von Mises-Fisher VAE trainer CLI.

Reimplements the reference binary (src/vmf_vae_main.cc:38-127).
"""

from __future__ import annotations

import sys

import jax

from ..models.vmf import VMFVAE
from ..ops.losses import vmf_loss
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

_MODEL_DESC = r"""Likelihood:
f(x) = C_d(kappa) exp(kappa mu'x)
where
              kappa^{d/2 - 1}
C_d(kappa) = -----------------------
             (2 pi)^{d/2} I_{d/2-1}(kappa)
"""


def _model_args(g) -> None:
    """Reference flags: vmf.hh:77-104."""
    g.add_argument("--encoding", type=_csv_ints, default=())
    g.add_argument("--decoding", type=_csv_ints, default=())
    g.add_argument("--latent", type=int, default=2)
    g.add_argument("--kappa_min", "--kappa-min", type=float, default=0.1)
    g.add_argument("--kappa_max", "--kappa-max", type=float, default=10.0)
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
    model = VMFVAE(
        data_dim=data_block.nfeature(),
        covar_dim=covar_block.nfeature(),
        latent=ns.latent,
        encoding=tuple(ns.encoding),
        decoding=tuple(ns.decoding),
        kappa_min=ns.kappa_min,
        kappa_max=ns.kappa_max,
        do_relu=ns.do_relu,
    )
    params = model.init(jax.random.PRNGKey(topt.seed))

    recorder = LatentRecorder(
        opts.out, topt.max_epoch, data_block.ntot(),
        encode_fn=lambda p, x: model.encode(p, x),
        mean_name="latent_mean", lnvar_name="latent_lnvar",
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
    fused_kw = {}
    tp = max(1, topt.tensor_parallel)
    if tp > 1:
        from ..parallel.mesh import make_mesh

        D = data_block.nfeature()
        if D % tp:
            raise ValueError(
                f"--tensor_parallel {tp} must divide the feature dim {D}"
            )
        mesh = make_mesh(model_parallel=tp)
        tp_kw = dict(tp_shard_map=True, data_dim=D,
                     tp_param_pspecs=model.tp_pspecs(params),
                     # TP recording at training cost: the recorder's
                     # encode over model-axis shards (psum'd Angular
                     # first layer)
                     tp_record_encode=lambda p, x: model.tp_encode(
                         p, x, None, "model"))
        # the vMF model is all-XLA: TP is sharded linear algebra with
        # psum'd norms (models/vmf.py tp_step_loss), one loss for both
        # the report and the boot pass
        fused_kw = dict(
            report_loss_override=lambda p, x, c, k, b: (
                model.tp_step_loss(p, x, c, k, b)
            ),
            boot_loss_override=lambda p, x, c, k, b: (
                model.tp_step_loss(p, x, c, k, b)
            ),
        )
    elif topt.data_parallel or topt.dp_shard or host_kw:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()

    if tp == 1 and topt.fused and topt.fused_step:
        # v3 packed-parameter step (ops/vmf_fast.py): hoisted data
        # views, hoisted encoder algebra, 2-leaf optimizer
        from ..ops.vmf_fast import VMFFastStep

        if VMFFastStep.supports(model):
            fused_kw["fast_step"] = VMFFastStep(
                model, topt,
                kl=(opts.kl_max, opts.kl_min, opts.kl_discount),
            )

    if _primary:
        # reference parity: model->pretty_print(std::cerr) at train
        # start (mmvae_alg.hh:238)
        from ..utils.summary import pretty_print

        pretty_print(model, params)
    params, scores = train_vae_model(
        forward, recorder, data_block, covar_block, topt,
        lambda x, out, beta: vmf_loss(x, out, beta),
        params,
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
