"""Capture + summarize a device trace of the packed fast-step epoch.

Usage:  python benchmarks/trace_step.py [nb|vmf|joint|mixture] [D] [S] [B]

Runs the same on-device dense-resident epoch protocol as bench.py for
the chosen model family, captures a jax.profiler trace around one
timed epoch, and prints the per-op device-time table (top ops by total
duration, normalized per batch).  Per-kernel device times through the
axon tunnel are trustworthy; python-loop timings are not (CLAUDE.md).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
import types
from collections import defaultdict

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import jax

_cache = os.path.join(_repo, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def build(kind: str, D: int, S: int):
    from mmvae_tpu.train.config import TrainingOptions
    from mmvae_tpu.train.loop import Trainer

    topt = TrainingOptions(nboot=3, superbatch=S, seed=0)
    if kind == "nb":
        from mmvae_tpu.models.nb import NBVAE
        from mmvae_tpu.ops.losses import nb_loss
        from mmvae_tpu.ops.nb_fast import NBFastStep

        model = NBVAE(data_dim=D, covar_dim=1, mean_latent=2)
        trainer = Trainer(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            lambda x, out, beta: nb_loss(x, out, beta),
            topt,
            boot_loss_fn=lambda x, out, beta: nb_loss(
                x, out, beta, include_data_const=False),
            fast_step=NBFastStep(model, topt),
        )
    elif kind == "vmf":
        from mmvae_tpu.models.vmf import VMFVAE
        from mmvae_tpu.ops.losses import vmf_loss
        from mmvae_tpu.ops.vmf_fast import VMFFastStep

        model = VMFVAE(data_dim=D, covar_dim=1, latent=2)
        trainer = Trainer(
            lambda p, x, c, k, t: model.forward(p, x, c, k, t),
            lambda x, out, beta: vmf_loss(x, out, beta),
            topt,
            fast_step=VMFFastStep(model, topt),
        )
    else:
        if kind == "joint":
            from mmvae_tpu.models.vmfnb import (
                VMFNBVAE,
                vmfnb_composite_loss as loss,
            )
            from mmvae_tpu.ops.vmfnb_fast import VMFNBFastStep as FS

            model = VMFNBVAE(data_dim=D, mean_latent=2)
        else:
            from mmvae_tpu.models.vmfnb_mixture import (
                VMFNBMixtureVAE,
                mixture_composite_loss as loss,
            )
            from mmvae_tpu.ops.vmfnb_fast import (
                VMFNBMixtureFastStep as FS,
            )

            K = 5
            rng = np.random.default_rng(0)
            label = rng.random((D, K)) < 0.3
            label[:, 0] |= ~label.any(axis=1)
            model = VMFNBMixtureVAE(label=label, mean_latent=2)
        trainer = Trainer(
            lambda p, x, c, k, t: model.forward(p, x, k, t),
            lambda x, out, beta: loss(x, out, beta),
            topt,
            fast_step=FS(model, topt),
        )
    params = model.init(jax.random.PRNGKey(0))
    return model, trainer, params


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "joint"
    if kind not in ("nb", "vmf", "joint", "mixture"):
        sys.exit(
            f"unknown model kind {kind!r}: nb | vmf | joint | mixture")
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    B = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    model, trainer, params = build(kind, D, S)
    opt_state = trainer.optimizer.init(params)

    ntot = S * B
    data_dense = jax.jit(
        lambda k: jax.random.poisson(k, 0.5, shape=(ntot, D)).astype(
            jnp.int16)
    )(jax.random.PRNGKey(42))
    np.asarray(data_dense[:1, :1])
    from mmvae_tpu.ops.densify import ensure_row_major

    data_dense = ensure_row_major(data_dense)
    runner = trainer.make_ondevice_epoch(
        types.SimpleNamespace(D=D), None, ntot, B, covar_dim=1,
        data_dense=data_dense,
    )
    for it in range(3):
        params, opt_state, rep = runner(params, opt_state, it)
    np.asarray(rep)

    from mmvae_tpu.utils.profiling import trace

    out_dir = f"/tmp/trace_{kind}"
    with trace(out_dir):
        t0 = time.perf_counter()
        for it in range(2):
            params, opt_state, rep = runner(params, opt_state, 3 + it)
        np.asarray(rep)
        dt = time.perf_counter() - t0
    print(f"2 epochs in {dt:.3f}s -> {2 * ntot / dt:.0f} cells/sec")
    summarize(out_dir, nbatch=2 * S)


def summarize(out_dir: str, nbatch: int):
    paths = glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace files under", out_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    # device lanes: pids whose process name mentions TPU/device
    dev_pids = set()
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = (e.get("args") or {}).get("name", "")
            if "TPU" in nm or "/device" in nm.lower():
                dev_pids.add(e.get("pid"))
    tot = defaultdict(float)
    cnt = defaultdict(int)

    def is_envelope(nm: str) -> bool:
        # the profiler emits NESTED X events: whole-dispatch envelopes
        # (jit_*), scan bodies (while*), and bare-number grouping lanes
        # enclose the leaf op events — summing them double-counts every
        # leaf ~4x (caught in round 5 when the nb total read 2394.6
        # us/batch against the known 598.6)
        return (nm.startswith("jit_") or nm.startswith("while")
                or nm.isdigit())

    for e in evs:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            nm = e.get("name", "?")
            tot[nm] += e.get("dur", 0.0)
            cnt[nm] += 1
    env = {nm: us for nm, us in tot.items() if nm.startswith("jit_")}
    rows = sorted(((nm, us) for nm, us in tot.items()
                   if not is_envelope(nm)), key=lambda kv: -kv[1])
    total = sum(us for _, us in rows)
    if env:
        nm, us = max(env.items(), key=lambda kv: kv[1])
        print(f"\ndispatch envelope {nm[:60]}: "
              f"{us / nbatch:.1f} us/batch (the step's device time)")
    print(f"device leaf-op total {total / 1e3:.2f} ms over {nbatch} "
          f"batches ({total / nbatch:.1f} us/batch)\n")
    print(f"{'us/batch':>9}  {'count':>6}  op")
    for nm, us in rows[:45]:
        print(f"{us / nbatch:9.2f}  {cnt[nm]:6d}  {nm[:90]}")


if __name__ == "__main__":
    main()
