"""On-device sparse-column densification.

The reference's in-memory path holds a CSC sparse matrix in host RAM and
densifies requested columns on the CPU per batch
(reference: include/mmvae_mem.hh:56-72).  On TPU the roles invert: HBM
is large and host->device bandwidth is the scarce resource, so the CSC
arrays live *on device* in a padded-ELL layout and each minibatch is
densified by an on-device gather+scatter — the only per-batch
host->device traffic is the (B,) column-index vector.

This also makes fully on-device epochs possible: the sequential
wrap-around batch schedule is computable inside jit, so an entire
epoch (input included) runs as one XLA computation
(see ``Trainer``'s on-device epoch support).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ell_fill_host(rows, vals, indptr, k_max: int, val_dtype, N: int):
    """Host-side padded-ELL fill from CSC arrays: native one-pass when
    the extension is available, vectorized numpy otherwise (each
    nonzero lands at (its column, its within-column offset); rows are
    -1-padded).  Shared by :class:`DeviceCSC` and the rotating
    :class:`~mmvae_tpu.data.shards.ShardStore` so the two fills cannot
    drift."""
    from ..io import native

    if native.available() and k_max > 0:
        # one native pass fills rows (-1-padded) and values in the
        # target dtype — several numpy passes over the nonzeros
        # otherwise (minutes at ~100M nnz on slow hosts)
        return native.ell_fill(rows, vals, indptr, k_max, val_dtype)
    ell_rows = np.full((N, k_max), -1, dtype=np.int32)
    ell_vals = np.zeros((N, k_max), dtype=val_dtype)
    if len(rows):
        counts = np.diff(indptr)
        col_ids = np.repeat(np.arange(N, dtype=np.int64), counts)
        offs = np.arange(len(rows), dtype=np.int64) - np.repeat(
            indptr[:-1].astype(np.int64), counts
        )
        ell_rows[col_ids, offs] = rows
        ell_vals[col_ids, offs] = vals
    return ell_rows, ell_vals


class DeviceCSC:
    """Device-resident sparse matrix in padded-ELL layout.

    Built from the CSC arrays of :class:`mmvae_tpu.data.MtxMemoryBlock`:
    for each of the N columns, up to ``k_max`` (row, value) pairs, padded
    with (-1, 0).  Memory: N * k_max * 8 bytes — proportional to the
    worst column, not to N*D.
    """

    def __init__(self, rows: np.ndarray, vals: np.ndarray,
                 indptr: np.ndarray, shape: tuple[int, int],
                 count_dtype: str = "float32", val_dtype=None):
        self.D, self.N = shape
        # narrow integer storage when lossless: counts are integers, so
        # int8/int16 halves-to-quarters the HBM-resident values and the
        # densified batches (the compute kernels widen bit-exactly).
        # ``val_dtype`` skips the value scan when the caller already
        # knows (MtxMemoryBlock gathers it during its native read).
        if val_dtype is None:
            from ..data.block import narrow_value_dtype

            val_dtype = (narrow_value_dtype(vals)
                         if count_dtype == "auto" else np.float32)
        counts = np.diff(indptr)
        self.k_max = int(counts.max()) if len(counts) else 0
        from ..io import native

        ell_rows, ell_vals = ell_fill_host(
            rows, vals, indptr, self.k_max, val_dtype, self.N
        )
        self.ell_rows = jnp.asarray(ell_rows)
        self.ell_vals = jnp.asarray(ell_vals)

    @classmethod
    def from_memory_block(cls, block,
                          count_dtype: str = "float32") -> "DeviceCSC":
        rows, vals, indptr = block.csc_arrays()
        # reuse the block's value-dtype decision when it matches the
        # request (avoids re-scanning the values)
        vd = getattr(block, "val_dtype", None)
        return cls(rows, vals, indptr, (block.nfeature(), block.ntot()),
                   count_dtype=count_dtype,
                   val_dtype=(vd if count_dtype == "auto" else None))

    def densify(self, cols: jax.Array) -> jax.Array:
        """(B,) column ids -> dense (B, D) batch, entirely on device."""
        return densify_ell(self.ell_rows, self.ell_vals, cols, self.D)


def dp_row_permutation(ntot: int, batch: int, ndev: int) -> np.ndarray:
    """Row order that makes DP on-device epochs collective-free.

    With the sequential schedule (batch b = rows [bB, bB+B)), device d
    owns slot range [d*B/nd, (d+1)*B/nd) of every batch.  Laying the
    dense array out as (device, batch, slot) makes each device's share
    of batch b a contiguous LOCAL slice of its shard."""
    assert ntot % batch == 0 and batch % ndev == 0
    nbatch = ntot // batch
    bl = batch // ndev
    idx = np.arange(ntot, dtype=np.int64).reshape(nbatch, ndev, bl)
    return idx.transpose(1, 0, 2).reshape(-1)


def materialize_dense(csc: DeviceCSC, chunk: int = 512,
                      order: np.ndarray | None = None) -> jax.Array:
    """Densify the WHOLE matrix once into an (N, D) device array.

    When N x D fits in HBM (the north-star 100k x 20k config is 4 GB at
    int16) this removes the per-batch scatter entirely: each minibatch
    becomes a contiguous row gather, ~free next to the train step.  The
    array keeps the ELL value dtype (int8/int16 when counts allow);
    compute paths widen bit-exactly, so trajectories are unchanged.

    ``order`` (optional, length-N row permutation) materializes row i
    of the output as column order[i] of the matrix — used by the DP
    on-device layout (:func:`dp_row_permutation`).
    """
    N, D = csc.N, csc.D
    chunk = max(1, min(chunk, N))
    nchunks = -(-N // chunk)
    dtype = csc.ell_vals.dtype

    # one jitted fori_loop: a single compile, a single (N, D) buffer
    # updated in place (an eager per-chunk loop pays per-op dispatch
    # through remote-device tunnels and doubles peak HBM)
    def fill_all(rows, vals, order_arr):
        cols0 = jnp.arange(chunk, dtype=jnp.int32)

        def body(i, dense):
            # final chunk overlaps backward so starts stay in bounds
            s = jnp.minimum(i * chunk, N - chunk)
            cols = cols0 + s
            if order_arr is not None:
                cols = order_arr[cols]
            xc = densify_ell(rows, vals, cols, D)
            return jax.lax.dynamic_update_slice(dense, xc, (s, 0))

        return jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((N, D), dtype)
        )

    order_dev = None if order is None else jnp.asarray(order, jnp.int32)
    return jax.jit(fill_all, static_argnames=())(
        csc.ell_rows, csc.ell_vals, order_dev
    )


def densify_ell(
    ell_rows: jax.Array, ell_vals: jax.Array, cols: jax.Array, D: int
) -> jax.Array:
    """Gather ELL columns and scatter into a zeroed (B, D) batch.

    Duplicate ``cols`` are supported (each batch slot gets its column's
    values), matching the duplicate-aware host loader
    (reference: include/mmvae_io.hh:122-131).
    """
    return densify_gathered(ell_rows[cols], ell_vals[cols], D)


def densify_gathered(r: jax.Array, v: jax.Array, D: int) -> jax.Array:
    """Scatter pre-gathered (B, K) ELL slices into a dense (B, D) batch.

    Split out of :func:`densify_ell` so contiguous batch schedules (the
    rotating-shard epoch) can replace the row gather with a cheaper
    ``dynamic_slice``.  ``r`` may be any signed integer dtype — the
    rotating tier ships int16 indices over the host link when D allows
    and widens here, post-gather, where the slice is only (B, K).
    """
    B, K = r.shape
    if r.dtype != jnp.int32:
        r = r.astype(jnp.int32)
    # Row indices within a column are unique (CSC), so a scatter-SET
    # with unique_indices unlocks XLA's faster lowering; padded entries
    # are routed out of bounds and dropped.  Measured ~20% faster than
    # a masked scatter-add on v5e.  The batch keeps ell_vals' dtype
    # (possibly int8/int16 — see DeviceCSC).
    r_oob = jnp.where(r >= 0, r, D)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K))
    out = jnp.zeros((B, D), v.dtype)
    return out.at[b_idx, r_oob].set(v, mode="drop", unique_indices=True)


def densify_triplets(r: jax.Array, c: jax.Array, v: jax.Array,
                     B: int, D: int) -> jax.Array:
    """Scatter one batch of packed (row-in-batch, gene, value) triplets
    into a dense (B, D) batch.

    The batch-packed CSR layout (:class:`~mmvae_tpu.data.shards
    .ShardStore` layout "csr") pads to the *maximum batch nnz* instead
    of ELL's per-cell ``k_max`` — 3-4x fewer bytes for skewed count
    distributions, which is what the beyond-HBM rotation tier ships
    over the host link.  Pad entries carry row ``B`` (out of bounds)
    and are dropped.  Indices may be int8/int16 and widen here."""
    if r.dtype != jnp.int32:
        r = r.astype(jnp.int32)
    if c.dtype != jnp.int32:
        c = c.astype(jnp.int32)
    out = jnp.zeros((B, D), v.dtype)
    return out.at[r, c].set(v, mode="drop", unique_indices=True)


def ensure_row_major(arr):
    """Return ``arr`` in the default row-major device layout.

    XLA chooses layouts for jit outputs: at some shapes the on-device
    producer of a resident matrix (e.g. a jitted RNG draw, or
    :func:`materialize_dense`) emits a COLUMN-major array.  A jitted
    epoch whose parameter layout is the default row-major then inserts
    a full transposing copy of the matrix at EVERY epoch dispatch
    (measured: 3.1 ms/epoch on a 1 GB (25600, 20000) int16 array —
    ~12 us/batch of pure relayout).  One explicit ``device_put`` here
    makes every later epoch copy-free.

    Host arrays and arrays already row-major pass through untouched;
    any failure (backend without layout introspection) degrades to a
    no-op rather than an error.
    """
    if not isinstance(arr, jax.Array):
        return arr
    try:
        lay = arr.format.layout
        want = tuple(range(arr.ndim))
        if lay is None or tuple(lay.major_to_minor) == want:
            return arr
        from jax.experimental.layout import Format, Layout

        return jax.device_put(
            arr, Format(Layout(major_to_minor=want), arr.sharding)
        )
    except Exception:
        return arr
