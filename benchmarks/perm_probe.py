"""Probe for VERDICT r4 item 3: does clustering high-count genes into
few lane tiles recover the e2e-vs-bench gap?

The step kernels pick their lgamma path PER (batch, lane-tile) tile:
all counts <= 7 -> exact select-products (fast), all-int any size ->
mixed product/Stirling (slower).  Real depth~1000 data scatters hot
genes across all 20 lane tiles, so every tile pays the mixed path.  A
load-time gene permutation that packs hot genes into few tiles would
let the rest keep the fast path.

This probe measures the isolated boot valgrad kernel on REAL batches
from the north-star file, original vs permuted gene order, plus the
fast-tile fraction, WITHOUT touching the production loader — the
decision (implement vs negative result) follows from the delta.

Run on the TPU:  python benchmarks/perm_probe.py [/tmp/ns100k.mtx.gz]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from mmvae_tpu.data.block import MtxMemoryBlock
    from mmvae_tpu.ops import nb_step as ns

    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ns100k.mtx.gz"
    B = 100
    blk = MtxMemoryBlock(path, path + ".index", B)
    D, N = blk.nfeature(), blk.ntot()
    rng = np.random.default_rng(0)

    # sample batches; per-gene max count over the sample decides the
    # clustering (a production loader would scan the whole CSC once)
    nsample = 12
    xs = []
    for b in range(nsample):
        cols = np.arange(b * B, (b + 1) * B) % N
        blk.clear()
        xs.append(blk.read(cols).copy())
    xs = np.stack(xs)                      # (nsample, B, D)
    gmax = xs.max(axis=(0, 1))
    hot = gmax > 7
    print(f"D={D}: {hot.sum()} hot genes (max>7), "
          f"{100 * hot.mean():.1f}%")
    perm = np.argsort(hot, kind="stable")  # cold genes first

    bp = ns._ceil_to(B, 8)
    td = ns._tile_for(bp)
    for name, order in (("original", np.arange(D)), ("permuted", perm)):
        xo = xs[:, :, order]
        # fast-tile fraction under this order (per batch, per lane tile)
        nt = int(np.ceil(D / td))
        pad = nt * td - D
        xpad = np.pad(xo, ((0, 0), (0, 0), (0, pad)))
        tiles = xpad.reshape(nsample, B, nt, td)
        fast = (tiles.max(axis=(1, 3)) <= 7)   # (nsample, nt)
        print(f"{name}: fast tiles {100 * fast.mean():.1f}%")

        # isolated kernel timing on the first sampled batch
        zm = jnp.asarray(rng.normal(size=(B, 2)), jnp.float32)
        c = jnp.ones((B, 1), jnp.float32)
        zn = jnp.asarray(rng.normal(size=(B, 1)), jnp.float32)
        depth = jnp.asarray(xo[0].sum(axis=1, keepdims=True), jnp.float32)
        wd = jnp.asarray(rng.normal(size=(2, D)) * 0.01, jnp.float32)
        wc = jnp.asarray(rng.normal(size=(1, D)) * 0.01, jnp.float32)
        wn = jnp.asarray(rng.normal(size=(1, D)) * 0.01, jnp.float32)
        b2 = jnp.zeros((D,), jnp.float32)
        bn = jnp.zeros((D,), jnp.float32)
        x_dev = jnp.asarray(xo[0].astype(np.int16))
        xp, zmp, cp, znp, dpp, W, dims = ns._prep(
            x_dev, zm, c, zn, depth, wd, wc, b2, wn, bn, None
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

        steps = 200

        def body(cr, _):
            return one(cr), None

        run = jax.jit(
            lambda cr: jax.lax.scan(body, cr, None, length=steps)[0]
        )
        ts = []
        for i in range(6):
            t0 = time.time()
            np.asarray(run(jnp.float32(0.0)))
            if i >= 3:
                ts.append((time.time() - t0) / steps)
        print(f"{name}: boot valgrad {np.median(ts) * 1e6:.1f} us/call")


if __name__ == "__main__":
    main()
