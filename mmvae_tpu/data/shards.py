"""Host-resident shard store for beyond-HBM rotation training.

The reference's defining capability is out-of-core training: dataset
size is bounded by disk, not memory (reference: include/mmvae_io.hh:
49-141 — BGZF-indexed random access; include/mmutil_index.hh:22-34).
On TPU the analogous middle tier is *host RAM beyond HBM*: when the
device-resident layouts (dense or padded ELL, :mod:`mmvae_tpu.ops
.densify`) exceed the HBM budget, the dataset is partitioned into R
shards of whole batches that live in host memory and rotate through
HBM, with the next shard's host->device transfer overlapped against
the current shard's compute (double-buffered; see
``Trainer.make_rotating_epoch``).

Layout per shard mirrors the resident tiers and is chosen to minimize
the per-epoch transfer volume:

- ``dense``: (rows, D) in the narrowest lossless count dtype — the
  row-gather fast layout, best for dense-ish matrices;
- ``ell``: (rows, k_max) padded index/value pairs — nnz-proportional,
  best for sparse matrices; indices ship as int16 when D allows
  (halving the index bytes over the host link) and are widened
  on device post-gather (:func:`~mmvae_tpu.ops.densify
  .densify_gathered`).

Shards are whole-batch row ranges of the sequential wrap-around
schedule (reference: mmvae_alg.hh:261-266): batch ``b`` covers rows
``[bB, bB+B) mod ntot``, so shard r holding batches ``[b0, b1)`` holds
rows ``[b0*B, b1*B) mod ntot`` *materialized in schedule order* —
every batch, including the final wrap-around one, is a contiguous
local slice of its shard.  Trajectories are bitwise-equal to the
resident paths (same values, same PRNG schedule; tested in
tests/test_rotate.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

import jax


@dataclass
class Shard:
    b0: int                      # first global batch id
    nb: int                      # number of batches
    arrays: tuple                # host arrays: (dense,) or (rows, vals)


@dataclass
class ShardStore:
    layout: str                  # "dense" | "ell"
    D: int
    ntot: int
    B: int
    nbatch: int
    val_dtype: np.dtype
    shards: list[Shard] = field(default_factory=list)
    pinned_idx: frozenset = frozenset()   # HBM-pinned shard indices
    _cache: dict = field(default_factory=dict)

    @property
    def nshards(self) -> int:
        return len(self.shards)

    def shard_bytes(self, r: int) -> int:
        return sum(a.nbytes for a in self.shards[r].arrays)

    def put(self, r: int) -> tuple:
        """Device arrays for shard ``r``.

        Pinned shards transfer once and stay HBM-resident (the hybrid
        tier: only the overflow beyond the pin budget pays per-epoch
        host->device traffic).  Rotating shards start a fresh async
        transfer — the copy proceeds in the background, overlapping
        with whatever compute is queued."""
        if r in self.pinned_idx:
            if r not in self._cache:
                self._cache[r] = tuple(
                    jax.device_put(a) for a in self.shards[r].arrays
                )
            return self._cache[r]
        return tuple(jax.device_put(a) for a in self.shards[r].arrays)

    @classmethod
    def build(cls, block, B: int, shard_budget: int | None = None,
              layout: str | None = None,
              pin_budget: int | None = None) -> "ShardStore":
        """Partition ``block`` (an in-memory CSC data block) into
        host-resident shards of whole batches, each within
        ``shard_budget`` bytes (MMVAE_SHARD_BYTES; the training loop
        defaults it to budget/8 so the two rotating double-buffers are
        a small HBM tax).

        ``pin_budget`` (MMVAE_PIN_BYTES) pins as many shards as fit
        permanently in HBM; only the remainder rotates.  Pinned and
        rotating shards are interleaved evenly across the epoch
        (Bresenham spread) so each rotating transfer hides behind
        several pinned shards' compute, not just its predecessor's."""
        from ..io import native

        if shard_budget is None:
            shard_budget = int(
                os.environ.get("MMVAE_SHARD_BYTES", 2 << 30)
            )
        rows_c, vals_c, indptr = block.csc_arrays()
        vd = np.dtype(getattr(block, "val_dtype", np.float32))
        D, ntot = block.nfeature(), block.ntot()
        k_max = block.k_max()
        nbatch = ntot // B + (1 if ntot % B else 0)

        idx_dtype = np.int16 if D < (1 << 15) - 1 else np.int32
        # batch-packed CSR: per-batch triplets padded to the max batch
        # nnz — for skewed count distributions 3-4x smaller than ELL's
        # per-cell k_max padding (the host-link bytes are the rotation
        # tier's roofline, so bytes ARE throughput)
        counts = np.diff(indptr)
        sched = np.arange(nbatch * B, dtype=np.int64) % ntot
        batch_nnz = counts[sched].reshape(nbatch, B).sum(axis=1)
        nnz_pad = int(batch_nnz.max()) if nbatch else 0
        row_in_b_dtype = np.int8 if B < (1 << 7) - 1 else np.int16
        csr_batch = nnz_pad * (np.dtype(row_in_b_dtype).itemsize
                               + np.dtype(idx_dtype).itemsize
                               + vd.itemsize)
        dense_row = D * vd.itemsize
        ell_row = k_max * (np.dtype(idx_dtype).itemsize + vd.itemsize)
        if layout is None:
            layout = os.environ.get("MMVAE_SHARD_LAYOUT") or min(
                ("dense", dense_row * B), ("ell", ell_row * B),
                ("csr", csr_batch), key=lambda kv: kv[1],
            )[0]
        assert layout in ("dense", "ell", "csr"), layout
        batch_bytes = {"dense": dense_row * B, "ell": ell_row * B,
                       "csr": csr_batch}[layout]

        # balanced whole-batch shards under the budget: R minimal, so
        # at most two distinct shard sizes -> at most two compiled
        # epoch-shard programs
        cap = max(1, shard_budget // max(1, batch_bytes))
        R = -(-nbatch // cap)
        s = -(-nbatch // R)

        store = cls(layout=layout, D=D, ntot=ntot, B=B, nbatch=nbatch,
                    val_dtype=vd)

        ell_rows = ell_vals = None
        if layout == "ell":
            # ONE global host ELL fill, then shards are row slices
            # (views except the wrap-padded final shard)
            from ..ops.densify import ell_fill_host

            ell_rows, ell_vals = ell_fill_host(
                rows_c, vals_c, indptr, k_max, vd, ntot
            )
            if idx_dtype is np.int16:
                ell_rows = ell_rows.astype(np.int16)  # -1 pad fits

        for r in range(R):
            b0, b1 = r * s, min(nbatch, (r + 1) * s)
            ids = np.arange(b0 * B, b1 * B, dtype=np.int64) % ntot
            if layout == "dense":
                if native.available():
                    x = native.dense_fill(rows_c, vals_c, indptr, D,
                                          vd, ids)
                else:
                    x = _dense_fill_np(rows_c, vals_c, indptr, D, vd,
                                       ids)
                arrays = (x,)
            elif layout == "csr":
                if native.available():
                    arrays = native.csr_fill(rows_c, vals_c, indptr,
                                             ids, B, nnz_pad,
                                             row_in_b_dtype, idx_dtype,
                                             vd)
                else:
                    arrays = _csr_fill_np(rows_c, vals_c, indptr, ids,
                                          B, nnz_pad, row_in_b_dtype,
                                          idx_dtype, vd)
            else:
                lo, hi = b0 * B, b1 * B
                if hi <= ntot:
                    arrays = (ell_rows[lo:hi], ell_vals[lo:hi])
                else:  # final shard wraps: materialize head rows after
                    arrays = (
                        np.concatenate([ell_rows[lo:ntot],
                                        ell_rows[:hi - ntot]]),
                        np.concatenate([ell_vals[lo:ntot],
                                        ell_vals[:hi - ntot]]),
                    )
            store.shards.append(Shard(b0=b0, nb=b1 - b0, arrays=arrays))

        if pin_budget is None:
            pin_budget = int(os.environ.get("MMVAE_PIN_BYTES", "0"))
        if pin_budget > 0 and R > 1:
            per = max(store.shard_bytes(i) for i in range(R))
            P = min(R - 1, pin_budget // per)
            n_rot = R - P
            # rotating shards at evenly spread positions so their
            # transfers overlap pinned compute, not each other
            rot = {int(j * R / n_rot) for j in range(n_rot)}
            store.pinned_idx = frozenset(range(R)) - rot
        return store


def _csr_fill_np(rows_c, vals_c, indptr, ids, B, nnz_pad,
                 row_dtype, idx_dtype, vd):
    """Batch-packed CSR shard fill: (nb, nnz_pad) triplet arrays.

    For each batch, its cells' nonzeros are packed contiguously as
    (row-in-batch, gene, value) and padded to ``nnz_pad`` with row
    sentinel ``B`` (dropped by the out-of-bounds scatter mode on
    device).  One vectorized numpy pass over the shard's nonzeros."""
    nb = len(ids) // B
    starts = indptr[ids]
    cnt = (indptr[ids + 1] - starts).astype(np.int64)
    rows_b = np.full((nb, nnz_pad), B, row_dtype)
    cols = np.zeros((nb, nnz_pad), idx_dtype)
    vals = np.zeros((nb, nnz_pad), vd)
    tot = int(cnt.sum())
    if tot:
        cum = np.concatenate([[0], np.cumsum(cnt)])
        # source positions in the CSC arrays (multi-range gather)
        pos = (np.arange(tot, dtype=np.int64)
               - np.repeat(cum[:-1], cnt) + np.repeat(starts, cnt))
        batch_of_cell = np.arange(len(ids), dtype=np.int64) // B
        # within-batch destination offset: cells pack back-to-back, so
        # a cell's base = nnz cumsum at the cell minus at its batch's
        # first cell
        off_base = cum[:-1] - cum[batch_of_cell * B]
        dst_col = (np.repeat(off_base, cnt)
                   + (np.arange(tot, dtype=np.int64)
                      - np.repeat(cum[:-1], cnt)))
        dst_row = np.repeat(batch_of_cell, cnt)
        rows_b[dst_row, dst_col] = np.repeat(
            (np.arange(len(ids)) % B).astype(row_dtype), cnt)
        cols[dst_row, dst_col] = rows_c[pos].astype(idx_dtype)
        vals[dst_row, dst_col] = vals_c[pos].astype(vd)
    return rows_b, cols, vals


def _dense_fill_np(rows_c, vals_c, indptr, D, vd, ids):
    """Pure-numpy subset densify (fallback when the native extension is
    unavailable): one vectorized multi-range gather + scatter."""
    starts = indptr[ids]
    cnt = indptr[ids + 1] - starts
    out = np.zeros((len(ids), D), vd)
    tot = int(cnt.sum())
    if tot:
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        pos = (np.arange(tot, dtype=np.int64)
               - np.repeat(cum, cnt) + np.repeat(starts, cnt))
        out_row = np.repeat(np.arange(len(ids)), cnt)
        out[out_row, rows_c[pos]] = vals_c[pos]
    return out
