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

# Outage resilience (round-3 verdict "weak #1"): a dead axon tunnel makes
# jax.devices() hang FOREVER in-process with no error, and transient
# drops recover within minutes.  A single fail-fast window erased round
# 3's number, so device contact is now probed in KILLABLE subprocesses
# with backoff, consuming up to ~80% of the run budget before giving up.
_BUDGET = float(os.environ.get("MMVAE_BENCH_BUDGET", "540"))


def _subprocess_probe(timeout: float) -> bool:
    """One device-contact attempt in a child process (killable on hang).

    Asserts the contacted backend is the TPU: a fast-failing plugin
    would otherwise fall back to CPU, 'succeed', and let the benchmark
    silently measure the 1-core host instead of the chip."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp;"
             "np.asarray(jnp.ones((1,)));"
             "assert jax.default_backend() in ('tpu', 'axon'), "
             "jax.default_backend()"],
            timeout=timeout, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_device(budget: float, probe=_subprocess_probe,
                    sleep=time.sleep, clock=time.monotonic,
                    probe_timeout: float = 90.0,
                    backoff: float = 15.0) -> bool:
    """Probe -> back off -> re-probe until device contact succeeds or
    ~80% of ``budget`` seconds are spent.  Injectable for tests."""
    # 80% of the budget may leave too little for a COLD bench after a
    # late recovery — that is deliberate: running late still has a
    # chance of producing the JSON line (warm caches finish in ~2-4
    # min), while giving up earlier guarantees no number at all.
    deadline = clock() + 0.8 * budget
    while True:
        remaining = deadline - clock()
        if remaining <= 0:
            return False
        if probe(min(probe_timeout, remaining)):
            return True
        remaining = deadline - clock()
        if remaining <= 0:
            return False
        sleep(min(backoff, remaining))


def main() -> None:
    import threading

    t_start = time.monotonic()
    if not wait_for_device(_BUDGET):
        sys.stderr.write(
            "bench: no device contact within %.0f s of probing "
            "(axon tunnel down?)\n" % (0.8 * _BUDGET)
        )
        sys.exit(2)

    # the tunnel answered a subprocess probe; guard THIS process's first
    # contact with a watchdog over the remaining budget (the in-process
    # backend init can still hang if the tunnel dies in between)
    _device_ready = threading.Event()
    _guard = max(60.0, _BUDGET - (time.monotonic() - t_start))

    def _watchdog():
        if not _device_ready.wait(_guard):
            sys.stderr.write(
                "bench: probe succeeded but no in-process device contact "
                "within %.0f s (axon tunnel died?)\n" % _guard
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

    # synthetic sparse-ish counts, device-resident as one dense int8
    # array — the production fast path (on-device epochs, one dispatch
    # per EPOCH with contiguous-slice batches).  Counts ride as int8:
    # the narrowest lossless dtype the real loader picks for counts
    # <= 127 (loop._build_dense), exact integers, minimum HBM traffic
    # (the kernels widen on load; int8 measured == int16 bitwise and
    # ~1% faster).  Generated ON DEVICE: host numpy poisson over 512M
    # elements plus the transfer cost minutes on the throttled 1-core
    # host and dominated bench wall time; the distribution (Poisson
    # 0.5, overwhelmingly the <=7 integer in-kernel fast path) is
    # unchanged.
    import types

    ntot = S * B
    # liveness probe FIRST, as a tiny op: the real data-gen compile can
    # legitimately take minutes over a degraded tunnel with a cold
    # compile cache — the watchdog should only catch a DEAD tunnel
    np.asarray(jnp.ones((1,)))
    if jax.default_backend() not in ("tpu", "axon"):
        sys.stderr.write(
            f"bench: refusing to measure backend "
            f"{jax.default_backend()!r} (TPU plugin missing?)\n"
        )
        sys.exit(2)
    _device_ready.set()
    data_dense = jax.jit(
        lambda k: jax.random.poisson(k, 0.5, shape=(ntot, D)).astype(
            jnp.int8
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
