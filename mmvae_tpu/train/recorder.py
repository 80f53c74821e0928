"""Artifact recorder: per-epoch latent posteriors and parameter dumps.

Reproduces the reference's output surface (SURVEY §2.6):

- ``${out}_<epoch>.{mu_mean,mu_lnvar}.gz`` (NB; vMF uses
  ``latent_mean``/``latent_lnvar``) — N x latent posterior matrices
  assembled batch-by-batch (reference: nbvae_recorder_t,
  include/models/nb.hh:569-662);
- ``${out}_<epoch>_<param>.gz`` — every named parameter as gzipped dense
  text (reference: nb.hh:599-615, write_tensor mmvae_io.hh:11-28);
- the mixture recorder additionally writes ``.clust.gz``
  (vmfnb_mixture.hh:797-804).

Weights are stored (in, out) on device; dumps transpose back to the
reference's (out, in) orientation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..io.writers import write_data_file


def zeropad(t: int, tmax: int) -> str:
    """Pad ``t`` to the digit width of ``tmax``
    (reference: utils/util.hh:98-107)."""
    return str(t).zfill(len(str(tmax)))


def flatten_params(params: dict) -> dict[str, np.ndarray]:
    """Flat {name: array} with reference-style keys and orientation."""
    out: dict[str, np.ndarray] = {}
    for name, p in params.items():
        if isinstance(p, dict):
            for sub, arr in p.items():
                a = np.asarray(arr)
                if sub == "weight" and a.ndim == 2:
                    a = a.T  # (in, out) -> torch's (out, in)
                if a.ndim == 3:
                    # stacked per-component heads (mixture model): emit one
                    # 2-D entry per leading index
                    for k in range(a.shape[0]):
                        ak = a[k].T if sub == "weight" else a[k]
                        out[f"{name}.{k}.{sub}"] = ak
                else:
                    out[f"{name}.{sub}"] = a
        else:
            out[name] = np.asarray(p)
    return out


class LatentRecorder:
    """N x latent posterior collector + artifact writer.

    ``encode_fn(params, x) -> (mean, lnvar)`` is the no-covariate encode
    (the reference records with ``encode_mu(x)``, nb.hh:628).  Extra
    per-batch matrices (e.g. mixture assignments) can be captured via
    ``extra_fn(params, x) -> array`` written as ``.<extra_name>.gz``.
    """

    def __init__(
        self,
        header: str,
        max_epoch: int,
        ntot: int,
        encode_fn: Callable,
        mean_name: str = "mu_mean",
        lnvar_name: str = "mu_lnvar",
        extra_fn: Callable | None = None,
        extra_name: str = "clust",
        write_params: bool = True,
        async_writes: bool = False,
        combined_fn: Callable | None = None,
    ):
        self.header = header
        self.max_epoch = max_epoch
        self.ntot = ntot
        self.encode = jax.jit(encode_fn)
        self.mean_name = mean_name
        self.lnvar_name = lnvar_name
        self.extra_fn = jax.jit(extra_fn) if extra_fn is not None else None
        # optional fused (params, x) -> ((mean, lnvar), extra): one jit
        # for the host recording path when encode and extra share
        # expensive work (e.g. the mixture E-step) — the on-device path
        # gets the same sharing from XLA CSE inside one epoch program
        self._combined = (jax.jit(combined_fn)
                          if combined_fn is not None else None)
        self.extra_name = extra_name
        self.write_params = write_params
        # opt-in: artifact writes run on a background thread, overlapping
        # the next epochs' compute; callers must flush() before reading
        # the files (train_vae_model flushes at training end)
        self._writer = None
        self._pending: list = []
        if async_writes:
            from concurrent.futures import ThreadPoolExecutor

            self._writer = ThreadPoolExecutor(max_workers=1)
        self.mean_out = np.zeros((ntot, 0), np.float32)
        self.lnvar_out = np.zeros((ntot, 0), np.float32)
        self.extra_out = np.zeros((ntot, 0), np.float32)
        # per-row last-write counter: lets multi-host merges reproduce
        # the single-host "last batch wins" semantics for wrap-around
        # duplicates (mmvae_alg.hh:261-266)
        self._stamp = np.full(ntot, -1, np.int64)
        self._calls = 0

    def _ensure(self, attr: str, cols: int) -> np.ndarray:
        mat = getattr(self, attr)
        if mat.shape[1] < cols:
            mat = np.zeros((self.ntot, cols), np.float32)
            setattr(self, attr, mat)
        return mat

    def update_on_batch(self, params, x, batch) -> None:
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.integer):
            # match the training step's precision path: integer batches
            # are widened before any raw-x matmul (loop._superbatch_step)
            # so recorded artifacts are dtype/mode-invariant
            x = x.astype(jnp.float32)
        extra = None
        if self._combined is not None and self.extra_fn is not None:
            (mean, lnvar), extra = self._combined(params, x)
        else:
            mean, lnvar = self.encode(params, x)
        mean = np.asarray(mean)
        lnvar = np.asarray(lnvar)
        mean_out = self._ensure("mean_out", mean.shape[1])
        lnvar_out = self._ensure("lnvar_out", lnvar.shape[1])
        batch = np.asarray(batch)
        ok = batch < self.ntot
        mean_out[batch[ok]] = mean[ok]
        lnvar_out[batch[ok]] = lnvar[ok]
        if self.extra_fn is not None:
            if extra is None:
                extra = self.extra_fn(params, x)
            extra = np.asarray(extra)
            extra_out = self._ensure("extra_out", extra.shape[1])
            extra_out[batch[ok]] = extra[ok]
        self._stamp[batch[ok]] = self._calls
        self._calls += 1

    def ingest(self, batches, enc, extra=None) -> None:
        """Consume a whole epoch of on-device-collected posteriors.

        ``enc`` is the stacked ``(mean, lnvar)`` pair of shape
        (nbatch, B, latent) produced by the on-device epoch runner;
        ``batches`` the matching (nbatch, B) column schedule.  Batches
        are applied in order, so wrap-around duplicates resolve to the
        last visit — identical to the per-batch host path."""
        mean_all = np.asarray(enc[0])
        lnvar_all = np.asarray(enc[1])
        mean_out = self._ensure("mean_out", mean_all.shape[2])
        lnvar_out = self._ensure("lnvar_out", lnvar_all.shape[2])
        extra_all = None
        if extra is not None and self.extra_fn is not None:
            extra_all = np.asarray(extra)
            extra_out = self._ensure("extra_out", extra_all.shape[2])
        for b, batch in enumerate(np.asarray(batches)):
            ok = batch < self.ntot
            mean_out[batch[ok]] = mean_all[b][ok]
            lnvar_out[batch[ok]] = lnvar_all[b][ok]
            if extra_all is not None:
                extra_out[batch[ok]] = extra_all[b][ok]
            # keep the last-write counter truthful for these rows too
            self._stamp[batch[ok]] = self._calls
            self._calls += 1

    def _merged(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Cross-host merge of the posterior matrices.

        Each host holds the rows its input shard visited; for rows
        visited by several hosts (wrap-around duplicates) the one with
        the highest write counter wins — identical to the single-host
        last-batch-wins order."""
        if jax.process_count() <= 1:
            return self.mean_out, self.lnvar_out, self.extra_out
        from jax.experimental import multihost_utils as mhu

        stamps = np.asarray(mhu.process_allgather(self._stamp))   # (H, N)
        winner = stamps.argmax(axis=0)                            # (N,)
        rows = np.arange(self.ntot)

        def pick(local):
            if local.shape[1] == 0:
                return local
            alls = np.asarray(mhu.process_allgather(local))       # (H, N, L)
            return alls[winner, rows]

        return pick(self.mean_out), pick(self.lnvar_out), pick(self.extra_out)

    def _write(self, path: str, arr: np.ndarray) -> None:
        if self._writer is None:
            write_data_file(path, arr)
        else:
            self._pending.append(self._writer.submit(write_data_file,
                                                     path, arr))

    def flush(self) -> None:
        """Wait for (and surface errors from) outstanding async writes."""
        pending, self._pending = self._pending, []
        for fut in pending:
            fut.result()

    def _bound_queue(self, limit: int = 64) -> None:
        """Surface errors from finished writes without blocking; only
        wait when the queue is genuinely deep (a recording epoch submits
        ~2 + nparams files).  The old unconditional flush made every
        recording epoch stall on the PREVIOUS epoch's gzip writes,
        defeating the async writer."""
        done = [f for f in self._pending if f.done()]
        for f in done:
            f.result()
        self._pending = [f for f in self._pending if not f.done()]
        if len(self._pending) > limit:
            self.flush()

    def _stage_params(self, params):
        """Dispatch the on-device packing of the parameter tree WITHOUT
        any host sync, returning a staged handle for
        :meth:`_finish_params`.

        The jitted concatenate produces FRESH device buffers (and
        ``jnp.copy`` does for non-f32 leaves), so no reference to the
        caller's parameter arrays survives — the next epoch dispatch may
        donate them while the writer thread fetches the staged copies
        concurrently with that epoch's compute."""
        leaves, treedef = jax.tree_util.tree_flatten(params)
        packable = [isinstance(a, jax.Array) and a.dtype == jnp.float32
                    for a in leaves]
        out = list(leaves)
        flat = None
        if any(packable):
            key = tuple((i, a.shape) for i, (a, p)
                        in enumerate(zip(leaves, packable)) if p)
            if getattr(self, "_packer_key", None) != key:
                # the jitted packer takes ONLY the packable leaves —
                # passing the full list would upload unused host-numpy
                # leaves to the device on every recording epoch
                def pack(ls):
                    return jnp.concatenate([jnp.ravel(a) for a in ls])

                self._packer_key = key
                self._packer = jax.jit(pack)
                self._packer_idx = [i for i, p in enumerate(packable)
                                    if p]
            flat = self._packer([leaves[i] for i in self._packer_idx])
        for i, a in enumerate(out):
            if isinstance(a, jax.Array) and not packable[i]:
                out[i] = jnp.copy(a)  # fresh buffer, fetched later
        # snapshot the packer indices INTO the handle: the writer thread
        # finishes this stage later, and a subsequent _stage_params with
        # a different leaf set would rebind self._packer_idx under it
        # (no packable leaf -> flat is None and the indices are unused)
        idx = list(self._packer_idx) if flat is not None else []
        return flat, out, treedef, idx

    def _finish_params(self, staged):
        """Fetch a :meth:`_stage_params` handle (ONE packed transfer +
        any non-f32 leaves) and rebuild the numpy tree.  Per-leaf
        ``np.asarray`` costs an ~27 ms round trip each over the
        remote-device tunnel (~0.8 s for the NB tree's 26 leaves every
        recording epoch); the packed layout pays one round trip."""
        flat_dev, out, treedef, packer_idx = staged
        if flat_dev is not None:
            flat = np.asarray(flat_dev)
            off = 0
            for i in packer_idx:
                n = int(np.prod(out[i].shape)) if out[i].ndim else 1
                out[i] = flat[off:off + n].reshape(out[i].shape)
                off += n
        for i, a in enumerate(out):
            if isinstance(a, jax.Array):
                out[i] = np.asarray(a)
        return jax.tree_util.tree_unflatten(treedef, out)

    def _fetch_params(self, params):
        """Synchronous fetch: stage + finish in one call (used by the
        non-async recording paths)."""
        return self._finish_params(self._stage_params(params))

    def update_on_epoch(self, params, epoch: int,
                        _direct: bool = False) -> None:
        mean_out, lnvar_out, extra_out = self._merged()
        if jax.process_index() != 0:
            return  # artifacts are written once, by the primary host
        if self._writer is not None and not _direct:
            self._bound_queue()
        if self.write_params:
            params = self._fetch_params(params)
        tag = f"{self.header}_{zeropad(epoch, self.max_epoch)}"
        write = (lambda p, a: write_data_file(p, a)) if _direct \
            else self._write
        if self._writer is not None and not _direct:
            # posterior matrices keep accumulating after this epoch:
            # snapshot them for the background writer
            mean_out = mean_out.copy()
            lnvar_out = lnvar_out.copy()
            extra_out = extra_out.copy()
        write(f"{tag}.{self.mean_name}.gz", mean_out)
        write(f"{tag}.{self.lnvar_name}.gz", lnvar_out)
        if self.extra_fn is not None:
            write(f"{tag}.{self.extra_name}.gz", extra_out)
        if self.write_params:
            for key, arr in flatten_params(params).items():
                write(f"{tag}_{key}.gz", arr)

    def submit_epoch(self, batches, enc, extra, params,
                     epoch: int) -> None:
        """Ingest + write one on-device recording epoch WITHOUT blocking
        the training loop.

        ``enc``/``extra`` are still-device arrays (the epoch runner's
        scan outputs); fetching them synchronizes on the epoch's device
        compute, so doing it on the writer thread lets the caller
        dispatch the NEXT epoch first and overlap the fetch + gzip
        writes with its compute.  Single-host async mode only: multi-
        host recording needs the ``_merged`` allgather, which must stay
        on the main thread next to the other collectives."""
        if self._writer is None or jax.process_count() > 1:
            self.ingest(batches, enc, extra)
            self.update_on_epoch(params, epoch)
            return

        staged = None
        if self.write_params:
            # stage params NOW without blocking: the jitted pack is an
            # async dispatch into FRESH device buffers, so the caller's
            # next epoch may donate the originals while the writer
            # thread fetches the copies concurrently with its compute
            # (the round-3 sync fetch here cost one ~27 ms tunnel RTT
            # per recording epoch — the 119k-vs-139k recording gap)
            staged = self._stage_params(params)

        def work():
            # runs on the single writer thread: ingest and writes stay
            # sequentially ordered with earlier submissions, and
            # _direct=True writes inline (a nested submit would queue
            # behind this task; waiting on it would deadlock)
            self.ingest(batches, enc, extra)
            p = self._finish_params(staged) if staged is not None \
                else params
            self.update_on_epoch(p, epoch, _direct=True)

        self._pending.append(self._writer.submit(work))
