"""Quantitative roofline for the NB valgrad boot kernel (VERDICT r4 §4).

The boot valgrad kernel (ops/nb_step.py:_make_valgrad_kernel,
need_value=False, int counts, fast select-product path) is ~45% of the
NB step.  This script turns "VPU-roofline-bound" from a judgment call
into arithmetic:

1. measures ACHIEVED per-element Pallas throughput on this chip for
   each op class the kernel uses (generic ALU ops, exp, log, divide),
   at the kernel's own tile geometry, via repetition-count slopes
   (fixed overhead cancels);
2. multiplies by the kernel's statically counted op mix (the counts
   are documented per source line below);
3. compares the prediction against the measured kernel time (same
   jitted-scan protocol).

Run on the TPU:  python benchmarks/valgrad_roofline.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BP, TD, NJ = 104, 1024, 20          # the production tile geometry
D = TD * NJ                          # 20480 ~ north-star D=20000 padded
STEPS = 200


def _scan_time(fn, x0, steps=STEPS, warm=3):
    """Median per-step seconds of a jitted carry-chained scan."""
    def body(c, _):
        return fn(c), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=steps)[0])
    ts = []
    for i in range(warm + 3):
        t0 = time.time()
        np.asarray(run(x0))
        if i >= warm:
            ts.append((time.time() - t0) / steps)
    return float(np.median(ts))


def _elementwise_kernel(nrep, op, chains=1):
    """Pallas kernel applying ``op`` nrep times per element per tile.

    ``chains`` > 1 runs that many INDEPENDENT dependency chains
    interleaved: a single chain measures op latency (1 op/cycle/lane
    issue), independent chains expose the VPU's superscalar issue —
    the real kernel's op mix has abundant ILP, so its roofline sits at
    the chained-issue rate, not the latency rate."""
    def kernel(x_ref, o_ref):
        ys = [x_ref[:] * (1.0 + 0.01 * i) for i in range(chains)]
        for _ in range(nrep):
            ys = [op(y) for y in ys]
        acc = ys[0]
        for y in ys[1:]:
            acc = acc + y
        o_ref[:] = acc

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(NJ,),
            in_specs=[pl.BlockSpec((BP, TD), lambda j: (0, j))],
            out_specs=pl.BlockSpec((BP, TD), lambda j: (0, j)),
            out_shape=jax.ShapeDtypeStruct((BP, D), jnp.float32),
        )(x)

    return call


def measure_op(name, op, reps=(8, 40), chains=1):
    """Per-element per-op seconds from the slope between two repetition
    counts (launch/memory overhead cancels).  The scan carry is a
    SCALAR (matching the valgrad measurement protocol): the (BP, D)
    input is closed over and perturbed by carry*1e-30, the output is
    reduced to one element — so the fixed per-step cost is the pallas
    launch + one input read, not a full-array HBM round trip."""
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(0.1, 0.9, (BP, D)), jnp.float32
    )

    def timed(nrep):
        call = _elementwise_kernel(nrep, op, chains)

        def one(carry):
            y = call(x0 + carry * 1e-30)
            return carry + y[0, 0] * 1e-30

        return _scan_time(one, jnp.float32(0.0))

    t_lo = timed(reps[0])
    t_hi = timed(reps[1])
    per_op = (t_hi - t_lo) / (reps[1] - reps[0]) / (BP * D) / chains
    print(f"  {name:8s}: {per_op * 1e12:8.3f} ps/elem "
          f"({t_lo * 1e6:.1f} -> {t_hi * 1e6:.1f} us)")
    return per_op


# Op mix of the boot fast path, counted from ops/nb_step.py
# _make_valgrad_kernel (need_value=False, x int8, softplus nu,
# R=2, C=1, Rn=1).  Line references are to the kernel body:
#   cvt x->f32 (473): 1; ls=h-lse (476): 1; mu=fma+eps (485): 2;
#   nupre fma (486): 2; abs/neg (498): 2; sp=max+add (499): 2;
#   nu=clip+eps (501): 3; fast-flag cmps+sel+reduce (507): 4;
#   select-products 7x(cmp+add+fma+sel+mul+sel) (269-274): 42;
#   dg=-dP/P neg (515): 1; mn,v,u (539-542): 3; rec muls (543-546): 3;
#   sig cmp+mul+sel (545): 3; inv_mn,inv_mu (549-550): 2;
#   dln mul+neg (563): 2; t (568): 2; dmu mul+sub+sel (569): 3;
#   dls (570): 2; dnu (571): 3; dnupre cmps+ands+mul+sel (576-577): 6;
#   rs_acc reduce (583): 1
ALU_OPS = (1 + 1 + 2 + 2 + 2 + 2 + 3 + 4 + 42 + 1 + 3 + 3 + 3 + 2 + 2
           + 2 + 3 + 2 + 3 + 6 + 1)          # = 90
EXP_OPS = 2      # exp(ls) (477), exp(-|nupre|) (498)
LOG_OPS = 2      # log1p (499), log(nu*inv_mn) (563)
DIV_OPS = 2      # dP/P (515), 1/(u*v) (543)


def measure_valgrad():
    """The real boot valgrad kernel, ISOLATED (not the full lse/valgrad/
    finish chain), at production shapes: grad-only, int8 counts,
    softplus nu, small-int fast path — the bench configuration."""
    sys.path.insert(0, ".")
    from mmvae_tpu.ops import nb_step as ns

    rng = np.random.default_rng(0)
    B, Dv, R, C, Rn = 100, 20000, 2, 1, 1
    x = jnp.asarray(rng.poisson(1.0, (B, Dv)).astype(np.int8))
    zm = jnp.asarray(rng.normal(size=(B, R)), jnp.float32)
    c = jnp.ones((B, C), jnp.float32)
    zn = jnp.asarray(rng.normal(size=(B, Rn)), jnp.float32)
    depth = jnp.asarray(rng.uniform(100, 1000, (B, 1)), jnp.float32)
    wd = jnp.asarray(rng.normal(size=(R, Dv)) * 0.01, jnp.float32)
    wc = jnp.asarray(rng.normal(size=(C, Dv)) * 0.01, jnp.float32)
    bias2 = jnp.zeros((Dv,), jnp.float32)
    wn = jnp.asarray(rng.normal(size=(Rn, Dv)) * 0.01, jnp.float32)
    bias_n = jnp.zeros((Dv,), jnp.float32)

    xp, zmp, cp, znp, dpp, W, dims = ns._prep(
        x, zm, c, zn, depth, wd, wc, bias2, wn, bias_n, None
    )
    lse = ns._lse_call(zmp, cp, W, dims["bp"], dims["Dp"],
                       ns._tile_for(dims["bp"]), dims["D"],
                       dims["R"], dims["C"])

    def one(carry):
        zmp_c = zmp + carry * 1e-30
        _, gout, rsum, u1, dzn = ns._valgrad_call(
            xp, zmp_c, cp, znp, dpp, lse, W,
            D=dims["D"], B=dims["B"], need_value=False,
        )
        return carry + gout[0, 0] * 1e-30 + rsum[0, 0] * 1e-30

    t = _scan_time(one, jnp.float32(0.0))
    return t


def main():
    print(f"devices: {jax.devices()}")
    print(f"tile geometry: ({BP}, {TD}) x {NJ} tiles = {BP}x{D}")
    ops = {
        "fma": lambda y: y * 0.9999 + 1e-4,
        "exp": lambda y: jnp.exp(-y) * 0.5 + 0.25,
        "log": lambda y: jnp.log1p(y) * 0.8 + 0.1,
        "div": lambda y: 1.0 / (1.0 + y),
        "select": lambda y: jnp.where(y > 0.5, y * 0.9, y),
    }
    rates = {}
    for ilp in (1, 4):
        print(f"per-op achieved throughput (pallas slope, ILP={ilp}):")
        rates[ilp] = {
            k: measure_op(k, op, chains=ilp) for k, op in ops.items()
        }

    n_elem = BP * D
    print(f"\nop-mix prediction over {BP}x{D} elements "
          "(latency-bound ILP=1 / issue-bound ILP=4):")
    preds = {}
    for ilp in (1, 4):
        r = dict(rates[ilp])
        # exp/log/div micro ops carry one extra fma to keep values
        # bounded: subtract the measured fma cost per rep
        for k in ("exp", "log", "div"):
            r[k] = max(r[k] - r["fma"], 0.0)
        alu_eff = min(r["fma"], r["select"] / 2)
        parts = {
            "ALU": ALU_OPS * alu_eff,
            "exp": EXP_OPS * r["exp"],
            "log": LOG_OPS * r["log"],
            "div": DIV_OPS * r["div"],
        }
        preds[ilp] = sum(parts.values()) * n_elem
        detail = ", ".join(f"{k} {v * n_elem * 1e6:.1f}us"
                           for k, v in parts.items())
        print(f"  ILP={ilp}: total {preds[ilp] * 1e6:7.1f} us ({detail})")

    t_real = measure_valgrad()
    print(f"\nmeasured boot valgrad via scan protocol: "
          f"{t_real * 1e6:.1f} us/step (includes ~fixed launch cost; "
          "the round-4 TRACE puts the kernel itself at 89.1 us)")
    print(f"elementwise roofline bracket: "
          f"[{preds[4] * 1e6:.1f}, {preds[1] * 1e6:.1f}] us "
          f"vs 89.1 us trace-measured")


if __name__ == "__main__":
    main()
