"""Throughput benchmark: NB-VAE training cells/sec/chip.

North-star config (BASELINE.json): 100k-cell x 20k-gene NB-VAE, batch
100, nboot 3, reference training protocol.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

``vs_baseline`` is relative to the driver-defined target of 50,000
cells/sec/chip (the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax

# persistent compilation cache: the superbatch step's first compile in a
# fresh process is expensive; cache it across bench runs
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp


def main() -> None:
    import threading

    # fail fast when the axon tunnel is down: backend init then hangs
    # forever inside jax.devices()/the first dispatch with no error
    # (observed: multi-hour outages).  The watchdog exits non-zero so
    # the driver sees a failed run quickly instead of a hang.
    _device_ready = threading.Event()

    def _watchdog():
        if not _device_ready.wait(420):
            sys.stderr.write(
                "bench: no device contact within 420 s "
                "(axon tunnel down?)\n"
            )
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()

    from mmvae_tpu.models.nb import NBVAE
    from mmvae_tpu.ops.losses import nb_loss
    from mmvae_tpu.train.config import TrainingOptions
    from mmvae_tpu.train.loop import Trainer

    D = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    B = 100          # reference default batch size (mmvae.hh:35)
    S = 256          # batches per on-device epoch (one dispatch per epoch;
                     # amortizes the pack/unpack + dispatch prologue the
                     # way real epochs do — the north-star run has 1000)
    NBOOT = 3

    from mmvae_tpu.ops.nb_fast import NBFastStep

    model = NBVAE(data_dim=D, covar_dim=1, mean_latent=2)
    params = model.init(jax.random.PRNGKey(0))

    topt = TrainingOptions(nboot=NBOOT, superbatch=S, seed=0)
    trainer = Trainer(
        lambda p, x, c, k, t: model.forward(p, x, c, k, t),
        lambda x, out, beta: nb_loss(x, out, beta),
        topt,
        boot_loss_fn=lambda x, out, beta: nb_loss(
            x, out, beta, include_data_const=False
        ),
        # v2 single-pass step kernels (ops/nb_step.py): in-kernel decoder
        # logits, fused value+grad boot pass, integer-count fast path
        report_loss_override=lambda p, x, c, k, b: model.fused_step_report(
            p, x, c, k, b, include_data_const=True
        ),
        boot_loss_override=lambda p, x, c, k, b: model.fused_step_boot(
            p, x, c, k, b, need_value=False
        ),
        # v3 packed-parameter step (ops/nb_fast.py): batch-hoisted
        # encoder, packed optimizer, int16-native counts
        fast_step=NBFastStep(model, topt),
    )
    opt_state = trainer.optimizer.init(params)

    # synthetic sparse-ish counts, device-resident as one dense int16
    # array — the production fast path (on-device epochs, one dispatch
    # per EPOCH with contiguous-slice batches).  Counts ride as int16:
    # integers are exact and the HBM traffic of the dominant tensor
    # halves (the kernels widen on load).  Generated ON DEVICE: host
    # numpy poisson over 512M elements plus the 1 GB transfer cost
    # minutes on the throttled 1-core host and dominated bench wall
    # time; the distribution (Poisson 0.5, overwhelmingly the <=7
    # integer in-kernel fast path) is unchanged.
    import types

    ntot = S * B
    # liveness probe FIRST, as a tiny op: the real data-gen compile can
    # legitimately take minutes over a degraded tunnel with a cold
    # compile cache — the watchdog should only catch a DEAD tunnel
    np.asarray(jnp.ones((1,)))
    _device_ready.set()
    data_dense = jax.jit(
        lambda k: jax.random.poisson(k, 0.5, shape=(ntot, D)).astype(
            jnp.int16
        )
    )(jax.random.PRNGKey(42))
    np.asarray(data_dense[:1, :1])  # force materialization
    # rebind through the relayout HERE so the column-major original is
    # freed — relayouting inside the trainer while this frame still
    # held the source would keep both 1 GB copies resident all run
    from mmvae_tpu.ops.densify import ensure_row_major

    data_dense = ensure_row_major(data_dense)
    runner = trainer.make_ondevice_epoch(
        types.SimpleNamespace(D=D), None, ntot, B, covar_dim=1,
        data_dense=data_dense,
    )

    # warmup / compile (3 epochs: the first compiles, the next two flush
    # any donation-aliasing recompile and warm the dispatch path)
    for it in range(3):
        params, opt_state, rep = runner(params, opt_state, it)
    np.asarray(rep)

    # timed, pipelined (sync once at the end; per-epoch fetches through
    # the axon tunnel cost ~27ms RTT and would swamp the measurement)
    iters = 12
    t0 = time.perf_counter()
    for it in range(iters):
        params, opt_state, rep = runner(params, opt_state, it + 3)
    np.asarray(rep)  # sync
    dt = time.perf_counter() - t0

    cells = iters * S * B
    cps = cells / dt
    print(json.dumps({
        "metric": "nbvae_train_cells_per_sec_per_chip",
        "value": round(cps, 1),
        "unit": "cells/sec",
        "vs_baseline": round(cps / 50000.0, 3),
    }))


if __name__ == "__main__":
    main()
