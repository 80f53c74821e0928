"""Training algorithm: KL-annealed, bootstrap-resampled Adam.

Semantics replicate ``train_vae_model`` (reference:
include/mmvae_alg.hh:200-338):

- sequential non-shuffled batches with wrap-around;
- per batch: one train-mode reporting forward (loss recorded, no step)
  followed by ``nboot`` gradient steps on bootstrap resamples (with
  replacement) of the same batch;
- Adam(lr, weight_decay=1e-4) with global-norm gradient clipping 1.0,
  in torch's order: clip raw grads -> add wd*param -> Adam moments;
- per-epoch mean reported loss accumulated into the scores vector.

TPU-native structure: the whole per-batch computation — reporting
forward, the nboot resample/grad/update loop (``lax.fori_loop``), the KL
schedule — is one jitted function, and ``superbatch`` consecutive
batches are processed per dispatch with ``lax.scan``, so host<->device
round trips happen a few times per epoch instead of 4x per batch.
PRNG keys are derived as fold_in(fold_in(seed, epoch), global_batch), so
runs are bit-reproducible for any superbatch size or device count
(the reference uses a nondeterministic ``std::random_device``,
mmvae_alg.hh:242-243).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.pipeline import PrefetchLoader, sequential_batches
from ..ops.losses import kl_weight_schedule
from ..utils.logging import TLOG
from ..utils.metrics import MetricsLogger
from ..utils.profiling import StepTimer, annotate, trace
from .config import TrainingOptions


def make_optimizer(opt: TrainingOptions,
                   tp: bool = False) -> optax.GradientTransformation:
    """torch-order Adam: clip -> +wd*param -> Adam(b1=.9,b2=.999,eps=1e-8)
    (reference: mmvae_alg.hh:234-236, 308-310).

    ``tp=True`` omits the local global-norm clip — tensor-parallel
    training clips against the cross-shard norm inside the step (the
    checkpoint template must match this structure)."""
    head = () if tp else (optax.clip_by_global_norm(opt.grad_clip),)
    return optax.chain(
        *head,
        optax.add_decayed_weights(opt.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-opt.lr),
    )


def _record_outputs(record_fns, params, x):
    """(enc, extra) scan outputs for a recording superbatch step.

    The inputs pass through an optimization barrier so the recording
    encode compiles as its own island: without it XLA CSE fuses the
    encode into the training forward and perturbs the training math at
    1 ulp, breaking the bitwise trajectory equality between recording
    and non-recording epochs (and across device layouts)."""
    encode_fn, extra_fn = record_fns
    params, x = jax.lax.optimization_barrier((params, x))
    enc = encode_fn(params, x)
    extra = extra_fn(params, x) if extra_fn is not None else jnp.zeros(())
    return (enc, extra)


class Trainer:
    """Compiles and runs the per-superbatch training step.

    Parameters
    ----------
    forward : (params, x, c, key, training) -> model output
    loss_fn : (x, out, beta) -> scalar loss
    opt     : TrainingOptions
    kl      : (kl_max, kl_min, kl_discount) annealing constants
    mesh    : optional jax Mesh for data/tensor parallelism; when given,
              inputs are sharded along the batch axis and parameters are
              replicated (see mmvae_tpu.parallel).

    Two data-parallel modes:

    - default (``dp_shard_map=False``): one jitted step with sharded
      inputs; XLA's SPMD partitioner inserts the collectives.  Bitwise
      identical to single-device runs (the PRNG draws are
      layout-invariant), but custom Pallas kernels inside the loss are
      opaque to the partitioner, which replicates their operands.
    - ``dp_shard_map=True``: the whole superbatch step runs under
      ``jax.shard_map`` over the 'data' axis — each shard computes its
      local loss/grads (Pallas kernels run unpartitioned on local
      shapes, the TPU-native layout for custom kernels) and gradients
      are ``pmean``-ed over ICI.  Reparameterization noise and
      bootstrap resampling are *per shard* (keys folded with the shard
      index, resampling within the local rows), so trajectories are
      deterministic but not bitwise equal across device counts — the
      high-throughput mode for multi-chip runs.
    """

    def __init__(
        self,
        forward: Callable,
        loss_fn: Callable,
        opt: TrainingOptions,
        kl: tuple[float, float, float] = (1.0, 1e-2, 0.1),
        mesh=None,
        boot_loss_fn: Callable | None = None,
        report_loss_override: Callable | None = None,
        boot_loss_override: Callable | None = None,
        dp_shard_map: bool = False,
        tp_shard_map: bool = False,
        data_dim: int | None = None,
        tp_param_pspecs=None,
        tp_record_encode: Callable | None = None,
        tp_record_extra: Callable | None = None,
        fast_step=None,
    ):
        self.forward = forward
        self.loss_fn = loss_fn
        # Gradient steps may use a cheaper loss that differs from the
        # reported one only by parameter-independent constants (identical
        # gradients => identical trajectory).
        self.boot_loss_fn = boot_loss_fn if boot_loss_fn is not None else loss_fn
        # Full overrides with signature (params, x, c, key, beta) -> scalar
        # let models supply fused forward+loss implementations (e.g. the
        # Pallas NB ELBO kernel) that bypass the forward/loss split.
        self._report_override = report_loss_override
        self._boot_override = boot_loss_override
        self.opt = opt
        self.kl_max, self.kl_min, self.kl_discount = kl
        self.mesh = mesh
        self.dp_shard_map = dp_shard_map and mesh is not None
        # TP mode: the whole step runs under shard_map over
        # ('data', 'model') with D-sized param axes and x's column axis
        # sharded over 'model' (kernel-aware TP, SURVEY §5.7).  The
        # loss overrides must be TP-aware (model.fused_step_*_tp).
        self.tp_shard_map = tp_shard_map and mesh is not None
        # v3 packed-parameter step (ops/nb_fast.py): not composable with
        # kernel-aware TP (which shards the named leaves) — keyed on the
        # mesh-guarded self.tp_shard_map so (tp_shard_map=True, mesh=None)
        # keeps the fast path instead of silently dropping to the ~45%
        # slower generic step
        self.fast = fast_step if not self.tp_shard_map else None
        if self.fast is not None:
            # single source of truth for the annealing constants
            self.fast.kl_max, self.fast.kl_min, self.fast.kl_discount = kl
        self._tp_data_dim = data_dim
        # name-aware parameter PartitionSpecs (model.tp_pspecs(params));
        # when given, they replace the size-match heuristic for both the
        # param and optimizer-state spec trees (fixes hidden widths == D)
        self._tp_param_pspecs = tp_param_pspecs
        # TP-aware recording functions ((shard params, shard x) -> out,
        # model_axis pre-bound): without them TP recording falls back to
        # the per-batch host loop (see can_step_record)
        self._tp_record_encode = tp_record_encode
        self._tp_record_extra = tp_record_extra
        self._tp_clip = None
        # TP strips the local clip from the chain and applies a
        # cross-shard global-norm clip in boot_body instead (same torch
        # order: clip raw grads, then +wd)
        self.optimizer = make_optimizer(opt, tp=self.tp_shard_map)
        self._x_sharding = None
        self._c_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import batch_sharding

            if self.tp_shard_map:
                self._x_sharding = NamedSharding(
                    mesh, P(None, "data", "model")
                )
                self._c_sharding = NamedSharding(mesh, P(None, "data", None))
            else:
                self._x_sharding = batch_sharding(mesh)
                self._c_sharding = self._x_sharding
        sb_step = (self._superbatch_step_fast if self.fast is not None
                   else self._superbatch_step)
        if self.tp_shard_map:
            self._step = None  # built lazily: specs need the pytrees
        elif self.dp_shard_map:
            from jax.sharding import PartitionSpec as P

            import functools

            step = jax.shard_map(
                functools.partial(sb_step, axis_name="data"),
                mesh=mesh,
                in_specs=(P(), P(), P(None, "data"), P(None, "data"),
                          P(), P(), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
            self._step = jax.jit(step, donate_argnums=(0, 1))
        else:
            self._step = jax.jit(sb_step, donate_argnums=(0, 1))
        self._step_rec = None  # recording variant, built on first use
        self._step_rec_key = None  # (encode_fn, extra_fn) identity pair
        self._base_key = jax.random.PRNGKey(opt.seed)

    def _tp_specs(self, params, opt_state):
        """(param, opt-state) PartitionSpec trees for the TP shard_map,
        building the cross-shard clip as a side effect."""
        from ..parallel.mesh import named_tree_pspecs, tree_pspecs

        assert self._tp_data_dim is not None, "tp_shard_map needs data_dim"
        if self._tp_param_pspecs is not None:
            p_specs = self._tp_param_pspecs
            o_specs = named_tree_pspecs(opt_state, p_specs)
        else:
            p_specs = tree_pspecs(params, self._tp_data_dim)
            o_specs = tree_pspecs(opt_state, self._tp_data_dim)
        self._tp_clip = self._make_tp_clip(p_specs, "model",
                                           self.opt.grad_clip)
        return p_specs, o_specs

    def _build_tp_step(self, params, opt_state):
        """shard_map step over ('data', 'model') with per-leaf specs."""
        import functools

        from jax.sharding import PartitionSpec as P

        p_specs, o_specs = self._tp_specs(params, opt_state)
        step = jax.shard_map(
            functools.partial(self._superbatch_step, axis_name="data"),
            mesh=self.mesh,
            in_specs=(p_specs, o_specs, P(None, "data", "model"),
                      P(None, "data"), P(), P(), P()),
            out_specs=(p_specs, o_specs, P()),
            check_vma=False,
        )
        self._step = jax.jit(step, donate_argnums=(0, 1))

    @staticmethod
    def _make_tp_clip(p_specs, model_axis, max_norm):
        from jax.sharding import PartitionSpec

        spec_leaves = jax.tree_util.tree_leaves(
            p_specs,
            is_leaf=lambda s: s is None or isinstance(s, PartitionSpec),
        )

        def sharded(spec):
            return spec is not None and any(a is not None for a in spec)

        def clip(grads):
            g_leaves = jax.tree_util.tree_leaves(grads)
            sq_sh = sum(
                (jnp.sum(jnp.square(g))
                 for g, s in zip(g_leaves, spec_leaves) if sharded(s)),
                start=jnp.float32(0.0),
            )
            sq_rp = sum(
                (jnp.sum(jnp.square(g))
                 for g, s in zip(g_leaves, spec_leaves) if not sharded(s)),
                start=jnp.float32(0.0),
            )
            total = jax.lax.psum(sq_sh, model_axis) + sq_rp
            gnorm = jnp.sqrt(total)
            scale = max_norm / jnp.maximum(gnorm, max_norm)
            return jax.tree_util.tree_map(lambda g: g * scale, grads)

        return clip

    # ------------------------------------------------------------------
    def _batch_step(self, params, opt_state, x, c, epoch_f, key,
                    axis_name=None):
        beta = kl_weight_schedule(
            epoch_f, self.kl_max, self.kl_min, self.kl_discount
        )
        if axis_name is not None:
            # shard-local PRNG stream: noise and bootstrap resamples are
            # drawn per shard (see class docstring)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_rep, k_boot = jax.random.split(key)

        # reporting loss: train-mode forward on the sequential batch,
        # no gradient step (mmvae_alg.hh:277-285)
        if self._report_override is not None:
            report = self._report_override(params, x, c, k_rep, beta)
        else:
            out = self.forward(params, x, c, k_rep, True)
            report = self.loss_fn(x, out, beta)
        if axis_name is not None:
            report = jax.lax.pmean(report, axis_name)

        B = x.shape[0]

        def boot_body(i, carry):
            params, opt_state = carry
            kb = jax.random.fold_in(k_boot, i)
            k_idx, k_fwd = jax.random.split(kb)
            # resample with replacement (mmvae_alg.hh:290-301)
            ridx = jax.random.randint(k_idx, (B,), 0, B)
            xb = jnp.take(x, ridx, axis=0)
            cb = jnp.take(c, ridx, axis=0) if c is not None else None

            if self._boot_override is not None:
                def lf(p):
                    return self._boot_override(p, xb, cb, k_fwd, beta)
            else:
                def lf(p):
                    o = self.forward(p, xb, cb, k_fwd, True)
                    return self.boot_loss_fn(xb, o, beta)

            grads = jax.grad(lf)(params)
            if axis_name is not None:
                # each shard's loss is a mean over its local rows, so
                # the global-batch gradient is the shard mean
                grads = jax.lax.pmean(grads, axis_name)
            if self._tp_clip is not None:
                # TP: clip against the CROSS-SHARD global norm (the
                # local chain has no clip in this mode)
                grads = self._tp_clip(grads)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        # static small nboot: Python-unroll (bitwise-identical to the
        # fori_loop; removes per-iteration while sequencing overhead)
        if self.opt.nboot <= 8:
            carry = (params, opt_state)
            for i in range(self.opt.nboot):
                carry = boot_body(i, carry)
            params, opt_state = carry
        else:
            params, opt_state = jax.lax.fori_loop(
                0, self.opt.nboot, boot_body, (params, opt_state)
            )
        return params, opt_state, report

    def _superbatch_step(
        self, params, opt_state, x_sb, c_sb, epoch_f, batch_ids, base_key,
        axis_name=None, record_fns=None,
    ):
        ekey = jax.random.fold_in(base_key, jnp.asarray(epoch_f, jnp.int32))
        # integer count batches ride the host->device link narrow (int8/
        # int16 from the in-memory block) but are widened on device
        # before any compute so trajectories are identical across data
        # modes and dtypes (integer x would change the precision path of
        # the raw-x matmuls)
        if jnp.issubdtype(x_sb.dtype, jnp.integer):
            x_sb = x_sb.astype(jnp.float32)

        def scan_body(carry, inp):
            params, opt_state = carry
            x, c, b_id = inp
            key = jax.random.fold_in(ekey, b_id)
            params, opt_state, report = self._batch_step(
                params, opt_state, x, c, epoch_f, key, axis_name=axis_name
            )
            out = report
            if record_fns is not None:
                # posterior right after this batch's updates — the
                # recorder's observation point (mmvae_alg.hh:315-317)
                out = (report,) + _record_outputs(record_fns, params, x)
            return (params, opt_state), out

        (params, opt_state), reports = jax.lax.scan(
            scan_body, (params, opt_state), (x_sb, c_sb, batch_ids)
        )
        return params, opt_state, reports

    def _superbatch_step_fast(
        self, params, opt_state, x_sb, c_sb, epoch_f, batch_ids, base_key,
        axis_name=None, record_fns=None,
    ):
        """Superbatch step on the v3 packed representation: the named
        params/opt-state convert to the packed layout ONCE per dispatch
        (cheap row concats), the scan runs entirely packed, and the
        boundary conversion restores the external structures — the
        checkpoint / recorder / artifact surface never sees the packed
        form."""
        fast = self.fast
        ekey = jax.random.fold_in(base_key, jnp.asarray(epoch_f, jnp.int32))
        q = fast.pack(params)
        po = fast.pack_opt_state(opt_state)
        rand = fast.draw_rand(ekey, batch_ids, x_sb.shape[1],
                              axis_name=axis_name)

        def scan_body(carry, inp):
            q, po = carry
            x, c, b_id, rnd = inp
            q, po, report = fast.batch_step(
                q, po, x, c, epoch_f, axis_name=axis_name, rand=rnd
            )
            out = report
            if record_fns is not None:
                xw = (x.astype(jnp.float32)
                      if jnp.issubdtype(x.dtype, jnp.integer) else x)
                out = (report,) + _record_outputs(
                    record_fns, fast.unpack(q), xw
                )
            return (q, po), out

        (q, po), reports = jax.lax.scan(
            scan_body, (q, po), (x_sb, c_sb, batch_ids, rand)
        )
        return fast.unpack(q), fast.unpack_opt_state(po), reports

    # ------------------------------------------------------------------
    def make_ondevice_epoch(self, data_csc, covar_csc, ntot: int, B: int,
                            covar_dim: int = 1, encode_fn=None,
                            extra_fn=None, data_dense=None):
        """Compile a whole-epoch step for device-resident data.

        The sequential wrap-around batch schedule
        (mmvae_alg.hh:261-266) is computed inside jit and each batch is
        gathered on device, so an entire epoch — input pipeline included
        — is one XLA computation with zero per-batch host traffic.  PRNG
        keys derive identically to the host-driven path, so trajectories
        are bit-identical.

        Two data layouts:

        - padded ELL (``data_csc``): each batch is densified by an
          on-device scatter (:mod:`mmvae_tpu.ops.densify`) — HBM scales
          with nnz, for matrices whose dense form doesn't fit;
        - dense-resident (``data_dense``, an (N, D) device array,
          typically int16): each batch is a contiguous row gather,
          removing the ~0.9 ms/batch scatter — the fast path when
          N x D fits in HBM.

        Device arrays are passed as jit *arguments*, not closed over:
        captured multi-GB arrays would be baked into the lowered
        program as constants.  Integer batches are widened to f32 right
        after the gather so trajectories are dtype-invariant.
        """
        nbatch = ntot // B + (1 if ntot % B else 0)
        from ..ops.densify import densify_ell

        D = data_csc.D
        Dc = covar_csc.D if covar_csc is not None else covar_dim
        covar_arrs = (
            (covar_csc.ell_rows, covar_csc.ell_vals)
            if covar_csc is not None else None
        )
        dense_mode = data_dense is not None

        fast = self.fast

        def make_epoch_fn(record: bool):
            # rand is pre-drawn OUTSIDE this jit (draw_rand in its own
            # dispatch): drawing in-graph makes XLA's compile time scale
            # superlinearly with nbatch (measured 11s/27s/97s at
            # 64/128/256 batches), while the same arrays as plain jit
            # arguments compile flat.  Trajectories are identical —
            # the draws are bitwise the same either way.
            def epoch_fn(params, opt_state, epoch_f, base_key,
                         data, covar, rand=None):
                ekey = jax.random.fold_in(base_key,
                                          jnp.asarray(epoch_f, jnp.int32))
                b_ids = jnp.arange(nbatch, dtype=jnp.int32)
                if fast is not None:
                    carry0 = (fast.pack(params),
                              fast.pack_opt_state(opt_state))
                    xs = (b_ids, rand)
                else:
                    carry0 = (params, opt_state)
                    xs = (b_ids, None)

                def scan_body(carry, inp):
                    st, opt_st = carry
                    b, rnd = inp
                    cols = (b * B + jnp.arange(B, dtype=jnp.int32)) % ntot
                    if dense_mode and ntot % B == 0:
                        # wrap-free schedule: contiguous rows — a slice
                        # beats a general row gather
                        x = jax.lax.dynamic_slice_in_dim(data, b * B, B, 0)
                    elif dense_mode:
                        x = jnp.take(data, cols, axis=0)
                    else:
                        x = densify_ell(data[0], data[1], cols, D)
                    if fast is None and jnp.issubdtype(x.dtype,
                                                      jnp.integer):
                        # the fast path widens narrow counts inside its
                        # own fused ops; the generic path widens here
                        x = x.astype(jnp.float32)
                    if covar is not None:
                        c = densify_ell(covar[0], covar[1], cols, Dc)
                        if jnp.issubdtype(c.dtype, jnp.integer):
                            c = c.astype(jnp.float32)
                    else:
                        c = jnp.ones((B, covar_dim), jnp.float32)
                    if fast is not None:
                        st, opt_st, rep = fast.batch_step(
                            st, opt_st, x, c, epoch_f, rand=rnd
                        )
                    else:
                        key = jax.random.fold_in(ekey, b)
                        st, opt_st, rep = self._batch_step(
                            st, opt_st, x, c, epoch_f, key
                        )
                    out = rep
                    if record:
                        # latent posterior right after this batch's
                        # updates — same observation point as the host
                        # path's recorder (mmvae_alg.hh:315-317)
                        p_rec = fast.unpack(st) if fast is not None else st
                        xr = (x.astype(jnp.float32)
                              if jnp.issubdtype(x.dtype, jnp.integer)
                              else x)
                        out = (rep,) + _record_outputs(
                            (encode_fn, extra_fn), p_rec, xr)
                    return (st, opt_st), out

                (st, opt_st), outs = jax.lax.scan(scan_body, carry0, xs)
                if fast is not None:
                    return (fast.unpack(st),
                            fast.unpack_opt_state(opt_st), outs)
                return st, opt_st, outs

            return epoch_fn

        jitted = jax.jit(make_epoch_fn(False), donate_argnums=(0, 1))
        jitted_rec = (
            jax.jit(make_epoch_fn(True), donate_argnums=(0, 1))
            if encode_fn is not None else None
        )
        if dense_mode:
            # device-generated matrices can land column-major; the jit
            # would re-copy the WHOLE array to row-major every epoch
            # (ops/densify.ensure_row_major docstring has the numbers)
            from ..ops.densify import ensure_row_major

            data_arrs = ensure_row_major(data_dense)
        else:
            data_arrs = (data_csc.ell_rows, data_csc.ell_vals)
        if fast is not None:
            b_ids = jnp.arange(nbatch, dtype=jnp.int32)
            jdraw = jax.jit(lambda bk, ef: fast.draw_rand(
                jax.random.fold_in(bk, jnp.asarray(ef, jnp.int32)),
                b_ids, B,
            ))
        else:
            jdraw = None

        def run(params, opt_state, epoch: int, record: bool = False):
            fn = jitted_rec if (record and jitted_rec is not None) else jitted
            ef = jnp.float32(epoch)
            rand = (jdraw(self._base_key, ef) if jdraw is not None
                    else None)
            return fn(params, opt_state, ef,
                      self._base_key, data_arrs, covar_arrs, rand)

        run.can_record = encode_fn is not None
        return run

    # ------------------------------------------------------------------
    def make_rotating_epoch(self, store, covar_csc, ntot: int, B: int,
                            covar_dim: int = 1, encode_fn=None,
                            extra_fn=None):
        """Beyond-HBM epochs: rotate host-resident shards through HBM.

        The TPU answer to the reference's out-of-core training
        (mmvae_io.hh:49-141): when neither the dense nor the ELL
        resident layout fits the HBM budget, the dataset lives in host
        RAM as R whole-batch shards (:class:`~mmvae_tpu.data.shards
        .ShardStore`) and each epoch runs R shard-scan dispatches.
        Shard r+1's async host->device transfer is issued *before*
        shard r's compute is dispatched, so the transfer rides behind
        the compute (double-buffered); a small host sync on shard
        r-1's report keeps at most two shard buffers in flight.  The
        first shard of the *next* epoch is prefetched behind the last
        shard's compute, so steady-state epochs never wait on a cold
        transfer.

        Batch values, schedule, and PRNG fold-in chain are identical to
        :meth:`make_ondevice_epoch` — trajectories are bitwise-equal to
        the resident paths (tests/test_rotate.py).
        """
        from ..ops.densify import (densify_ell, densify_gathered,
                                   densify_triplets)

        nbatch = store.nbatch
        D = store.D
        Dc = covar_csc.D if covar_csc is not None else covar_dim
        covar_arrs = (
            (covar_csc.ell_rows, covar_csc.ell_vals)
            if covar_csc is not None else None
        )
        layout = store.layout
        fast = self.fast

        def make_shard_fn(record: bool):
            # one program per (shard size, record) — ShardStore builds
            # at most two distinct sizes, so at most two compiles each
            def shard_fn(params, opt_state, epoch_f, base_key, b0,
                         data, covar, rand=None):
                ekey = jax.random.fold_in(base_key,
                                          jnp.asarray(epoch_f, jnp.int32))
                # dense/ell shards carry nb*B rows; csr shards carry a
                # (nb, nnz_pad) leading batch axis directly
                nb_s = (data[0].shape[0] if layout == "csr"
                        else data[0].shape[0] // B)
                if rand is not None:
                    # slice this shard's rows out of the full-epoch
                    # pre-drawn rand (leading dim nbatch) — bitwise the
                    # same draws as the resident epoch's xs slices
                    rand = jax.tree_util.tree_map(
                        lambda a: jax.lax.dynamic_slice_in_dim(
                            a, b0, nb_s, 0), rand)
                b_loc = jnp.arange(nb_s, dtype=jnp.int32)
                if fast is not None:
                    carry0 = (fast.pack(params),
                              fast.pack_opt_state(opt_state))
                    xs = (b_loc, rand)
                else:
                    carry0 = (params, opt_state)
                    xs = (b_loc, None)

                def scan_body(carry, inp):
                    st, opt_st = carry
                    i, rnd = inp
                    b = b0 + i  # global batch id (PRNG/kl schedule)
                    if layout == "dense":
                        x = jax.lax.dynamic_slice_in_dim(
                            data[0], i * B, B, 0)
                    elif layout == "csr":
                        tr, tc, tv = (jax.lax.dynamic_index_in_dim(
                            a, i, 0, keepdims=False) for a in data)
                        x = densify_triplets(tr, tc, tv, B, D)
                    else:
                        er = jax.lax.dynamic_slice_in_dim(
                            data[0], i * B, B, 0)
                        ev = jax.lax.dynamic_slice_in_dim(
                            data[1], i * B, B, 0)
                        x = densify_gathered(er, ev, D)
                    if fast is None and jnp.issubdtype(x.dtype,
                                                      jnp.integer):
                        x = x.astype(jnp.float32)
                    if covar is not None:
                        cols = (b * B
                                + jnp.arange(B, dtype=jnp.int32)) % ntot
                        c = densify_ell(covar[0], covar[1], cols, Dc)
                        if jnp.issubdtype(c.dtype, jnp.integer):
                            c = c.astype(jnp.float32)
                    else:
                        c = jnp.ones((B, covar_dim), jnp.float32)
                    if fast is not None:
                        st, opt_st, rep = fast.batch_step(
                            st, opt_st, x, c, epoch_f, rand=rnd
                        )
                    else:
                        key = jax.random.fold_in(ekey, b)
                        st, opt_st, rep = self._batch_step(
                            st, opt_st, x, c, epoch_f, key
                        )
                    out = rep
                    if record:
                        p_rec = (fast.unpack(st) if fast is not None
                                 else st)
                        xr = (x.astype(jnp.float32)
                              if jnp.issubdtype(x.dtype, jnp.integer)
                              else x)
                        out = (rep,) + _record_outputs(
                            (encode_fn, extra_fn), p_rec, xr)
                    return (st, opt_st), out

                (st, opt_st), outs = jax.lax.scan(scan_body, carry0, xs)
                if fast is not None:
                    return (fast.unpack(st),
                            fast.unpack_opt_state(opt_st), outs)
                return st, opt_st, outs

            return shard_fn

        jitted = jax.jit(make_shard_fn(False), donate_argnums=(0, 1))
        jitted_rec = (
            jax.jit(make_shard_fn(True), donate_argnums=(0, 1))
            if encode_fn is not None else None
        )
        if fast is not None:
            b_ids = jnp.arange(nbatch, dtype=jnp.int32)
            jdraw = jax.jit(lambda bk, ef: fast.draw_rand(
                jax.random.fold_in(bk, jnp.asarray(ef, jnp.int32)),
                b_ids, B,
            ))
        else:
            jdraw = None

        R = store.nshards
        rotating = [r for r in range(R) if r not in store.pinned_idx]
        carry = {"idx": None, "dev": None}  # prefetched rotating shard

        def _next_rot(after: int):
            """First rotating index after ``after``, wrapping to the
            next epoch's first rotating shard."""
            for r in rotating:
                if r > after:
                    return r
            return rotating[0] if rotating else None

        def run(params, opt_state, epoch: int, record: bool = False):
            fn = (jitted_rec if (record and jitted_rec is not None)
                  else jitted)
            ef = jnp.float32(epoch)
            rand = (jdraw(self._base_key, ef) if jdraw is not None
                    else None)
            reps, encs, extras = [], [], []
            rot_reps: list = []  # backpressure on rotating buffers only
            for r in range(R):
                if carry["idx"] == r:
                    dev = carry["dev"]
                    carry["idx"] = carry["dev"] = None
                else:
                    # pinned: cached after the first epoch; rotating:
                    # cold path (first epoch, or R == 1)
                    dev = store.put(r)
                nxt = _next_rot(r)
                if nxt is not None and carry["idx"] is None:
                    # keep exactly one rotating transfer in flight —
                    # the next one this (or the next) epoch needs — so
                    # it overlaps the pinned/rotating compute between
                    # here and there.  Before issuing it, force the
                    # rep of the rotating shard before last: never
                    # more than ~3 rotating buffers alive even though
                    # the Python loop dispatches far ahead.
                    if len(rot_reps) >= 2:
                        np.asarray(rot_reps.pop(0))
                    carry["idx"], carry["dev"] = nxt, store.put(nxt)
                params, opt_state, out = fn(
                    params, opt_state, ef, self._base_key,
                    jnp.asarray(store.shards[r].b0, jnp.int32),
                    dev, covar_arrs, rand,
                )
                dev = None  # drop our ref; queued compute keeps it live
                if record:
                    rep, enc, extra = out
                    encs.append(enc)
                    extras.append(extra)
                else:
                    rep = out
                reps.append(rep)
                if r in rotating or not store.pinned_idx:
                    rot_reps.append(rep)
            rep_all = jnp.concatenate(reps, axis=0)
            if record:
                enc_all = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *encs)
                extra_all = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs, axis=0), *extras)
                return params, opt_state, (rep_all, enc_all, extra_all)
            return params, opt_state, rep_all

        run.can_record = encode_fn is not None
        run.nshards = R
        return run

    # ------------------------------------------------------------------
    def make_ondevice_epoch_dp(self, data_dense_perm, ntot: int, B: int,
                               covar_dim: int = 1, encode_fn=None,
                               extra_fn=None):
        """Whole-epoch runner for device-resident data UNDER DATA
        PARALLELISM: the dense array is laid out in (device, batch,
        slot) row order (:func:`mmvae_tpu.ops.densify.dp_row_permutation`)
        and the epoch runs under ``shard_map`` over 'data', so every
        device trains on a contiguous LOCAL slice per batch — zero
        per-batch collectives besides the gradient pmean.  Semantics
        match the dp_shard host path (per-shard keys folded with the
        data-axis index), so trajectories are equal to host DP runs.

        Restricted to the all-ones covariate and ntot % B == 0 (callers
        fall back to the host path otherwise)."""
        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P

        assert self.mesh is not None
        ndev = self.mesh.shape["data"]
        assert ntot % B == 0 and B % ndev == 0
        nbatch = ntot // B
        Bl = B // ndev

        fast = self.fast

        def epoch_fn(record: bool, params, opt_state, epoch_f, base_key,
                     data, rand=None):
            ekey = jax.random.fold_in(base_key,
                                      jnp.asarray(epoch_f, jnp.int32))
            b_ids = jnp.arange(nbatch, dtype=jnp.int32)
            if fast is not None:
                carry0 = (fast.pack(params), fast.pack_opt_state(opt_state))
                xs = (b_ids, rand)
            else:
                carry0 = (params, opt_state)
                xs = (b_ids, None)

            def scan_body(carry, inp):
                st, opt_st = carry
                b, rnd = inp
                x = jax.lax.dynamic_slice_in_dim(data, b * Bl, Bl, 0)
                if fast is None and jnp.issubdtype(x.dtype, jnp.integer):
                    x = x.astype(jnp.float32)
                c = jnp.ones((Bl, covar_dim), jnp.float32)
                if fast is not None:
                    st, opt_st, rep = fast.batch_step(
                        st, opt_st, x, c, epoch_f, axis_name="data",
                        rand=rnd,
                    )
                else:
                    key = jax.random.fold_in(ekey, b)
                    st, opt_st, rep = self._batch_step(
                        st, opt_st, x, c, epoch_f, key,
                        axis_name="data",
                    )
                out = rep
                if record:
                    p_rec = fast.unpack(st) if fast is not None else st
                    xr = (x.astype(jnp.float32)
                          if jnp.issubdtype(x.dtype, jnp.integer) else x)
                    out = (rep,) + _record_outputs(
                        (encode_fn, extra_fn), p_rec, xr)
                return (st, opt_st), out

            (st, opt_st), outs = jax.lax.scan(scan_body, carry0, xs)
            if fast is not None:
                return (fast.unpack(st), fast.unpack_opt_state(opt_st),
                        outs)
            return st, opt_st, outs

        # rand is drawn in its own (shard_map) dispatch and passed as a
        # sharded argument — in-graph draws make XLA compile time scale
        # superlinearly with nbatch (see make_ondevice_epoch); the
        # per-device values (axis_index fold) are bitwise unchanged
        rand_specs = None
        if fast is not None:
            # derived from the fast step's own _draw_batch structure —
            # a hardcoded NB-shaped dict here crashed the vMF (1-tuple
            # boot_eps) and joint (3-tuple) fast steps under --dp_shard
            rand_specs = fast.rand_pspecs(P, "data")

            def draw_fn(base_key, epoch_f):
                ekey = jax.random.fold_in(
                    base_key, jnp.asarray(epoch_f, jnp.int32)
                )
                return fast.draw_rand(
                    ekey, jnp.arange(nbatch, dtype=jnp.int32), Bl,
                    axis_name="data",
                )

            jdraw = jax.jit(jax.shard_map(
                draw_fn, mesh=self.mesh, in_specs=(P(), P()),
                out_specs=rand_specs, check_vma=False,
            ))
        else:
            jdraw = None

        def build(record: bool):
            out_rep = P()
            if record:
                extra_spec = P(None, "data", None) if extra_fn is not None \
                    else P()
                outs_spec = (out_rep, (P(None, "data", None),
                                       P(None, "data", None)), extra_spec)
            else:
                outs_spec = out_rep
            step = jax.shard_map(
                functools.partial(epoch_fn, record),
                mesh=self.mesh,
                in_specs=(P(), P(), P(), P(), P("data", None),
                          rand_specs),
                out_specs=(P(), P(), outs_spec),
                check_vma=False,
            )
            return jax.jit(step, donate_argnums=(0, 1))

        jitted = build(False)
        jitted_rec = build(True) if encode_fn is not None else None
        sharding = NamedSharding(self.mesh, P("data", None))
        if jax.process_count() > 1:
            # multi-host: the argument is this host's (N/H, D) shard
            from ..parallel.multihost import global_batch_array

            data_sharded = global_batch_array(
                sharding, np.asarray(data_dense_perm)
            )
        else:
            from ..ops.densify import ensure_row_major

            # pin row-major so a column-major source doesn't force a
            # full relayout copy at every epoch dispatch (see
            # ops/densify.ensure_row_major)
            data_sharded = ensure_row_major(
                jax.device_put(data_dense_perm, sharding)
            )

        def run(params, opt_state, epoch: int, record: bool = False):
            # callers must check run.can_record (train() does): the
            # non-recording step returns a different output structure
            assert not record or jitted_rec is not None
            fn = jitted_rec if record else jitted
            ef = jnp.float32(epoch)
            rand = jdraw(self._base_key, ef) if jdraw is not None else None
            return fn(params, opt_state, ef,
                      self._base_key, data_sharded, rand)

        # multi-host recording: each host fetches its local shard of the
        # scan outputs (parallel.multihost.local_rows) and the recorder's
        # cross-host merge assembles the full matrices at write time
        run.can_record = encode_fn is not None
        return run

    # ------------------------------------------------------------------
    def make_ondevice_epoch_tp(self, data_dense_perm, ntot: int, B: int,
                               params, opt_state, covar_dim: int = 1,
                               needs_extra: bool = False):
        """Whole-epoch runner for device-resident data under KERNEL-AWARE
        TENSOR PARALLELISM (+ data parallelism): the dense array is
        sharded over ('data', 'model') — rows in the DP (device, batch,
        slot) order (:func:`~mmvae_tpu.ops.densify.dp_row_permutation`
        over the 'data' axis), columns D-sharded — and the epoch runs
        under the same 2-D ``shard_map`` the TP batch step uses, so the
        highest-throughput data path composes with the feature-sharded
        compute path (VERDICT r2 item 4).  Per-batch semantics are
        exactly ``_batch_step(axis_name='data')`` with the TP loss
        overrides and cross-shard clip, so trajectories equal the host
        TP path.

        Restricted to the all-ones covariate, a wrap-free schedule, and
        single-host runs.  Recording uses the model's TP-aware record
        functions (``tp_record_encode`` / ``tp_record_extra``) as scan
        outputs, exactly like the DP runner; without them recording
        falls back to the host loop (matching :meth:`can_step_record`)."""
        import functools

        from jax.sharding import NamedSharding, PartitionSpec as P

        assert self.mesh is not None and self.tp_shard_map
        ndata = self.mesh.shape["data"]
        assert ntot % B == 0 and B % ndata == 0
        nbatch = ntot // B
        Bl = B // ndata
        record_fns = (self._tp_record_encode,
                      self._tp_record_extra if needs_extra else None)

        p_specs, o_specs = self._tp_specs(params, opt_state)

        def epoch_fn(record, params, opt_state, epoch_f, base_key, data):
            ekey = jax.random.fold_in(base_key,
                                      jnp.asarray(epoch_f, jnp.int32))

            def scan_body(carry, b):
                st, opt_st = carry
                x = jax.lax.dynamic_slice_in_dim(data, b * Bl, Bl, 0)
                if jnp.issubdtype(x.dtype, jnp.integer):
                    x = x.astype(jnp.float32)
                c = jnp.ones((Bl, covar_dim), jnp.float32)
                key = jax.random.fold_in(ekey, b)
                st, opt_st, rep = self._batch_step(
                    st, opt_st, x, c, epoch_f, key, axis_name="data"
                )
                out = rep
                if record:
                    out = (rep,) + _record_outputs(record_fns, st, x)
                return (st, opt_st), out

            (st, opt_st), reps = jax.lax.scan(
                scan_body, (params, opt_state),
                jnp.arange(nbatch, dtype=jnp.int32),
            )
            return st, opt_st, reps

        def build(record: bool):
            if record:
                extra_spec = (P(None, "data", None)
                              if record_fns[1] is not None else P())
                outs_spec = (P(), (P(None, "data", None),
                                   P(None, "data", None)), extra_spec)
            else:
                outs_spec = P()
            step = jax.shard_map(
                functools.partial(epoch_fn, record),
                mesh=self.mesh,
                in_specs=(p_specs, o_specs, P(), P(), P("data", "model")),
                out_specs=(p_specs, o_specs, outs_spec),
                check_vma=False,
            )
            return jax.jit(step, donate_argnums=(0, 1))

        can_record = record_fns[0] is not None and (
            not needs_extra or record_fns[1] is not None
        )
        jitted = build(False)
        jitted_rec = build(True) if can_record else None
        sharding = NamedSharding(self.mesh, P("data", "model"))
        from ..ops.densify import ensure_row_major

        data_sharded = ensure_row_major(
            jax.device_put(data_dense_perm, sharding)
        )

        def run(params, opt_state, epoch: int, record: bool = False):
            # callers must check run.can_record (train() does): the
            # non-recording step returns a different output structure
            assert not record or jitted_rec is not None
            fn = jitted_rec if record else jitted
            return fn(params, opt_state, jnp.float32(epoch),
                      self._base_key, data_sharded)

        run.can_record = can_record
        return run

    # ------------------------------------------------------------------
    def _put(self, arr: np.ndarray, covar: bool = False):
        """Device-put a (S, B, D) superbatch, sharded over the mesh's
        batch axis when data parallelism is on (TP additionally shards
        x's feature axis; covariates stay feature-replicated).  In
        multi-host runs the argument is this host's (S, B/H, D) slice
        and the global array is assembled across processes (sharded
        input, SURVEY §5.8)."""
        sharding = self._c_sharding if covar else self._x_sharding
        if sharding is not None:
            if jax.process_count() > 1:
                from ..parallel.multihost import global_batch_array

                return global_batch_array(sharding, arr)
            return jax.device_put(arr, sharding)
        return jnp.asarray(arr)

    def step(self, params, opt_state, x_sb, c_sb, epoch, batch_ids):
        """Run one superbatch of sequential batches; returns
        (params, opt_state, per-batch reported losses)."""
        if self._step is None:  # TP mode builds specs from the pytrees
            self._build_tp_step(params, opt_state)
        return self._step(
            params,
            opt_state,
            self._put(x_sb),
            self._put(c_sb, covar=True),
            jnp.float32(epoch),
            jnp.asarray(batch_ids, jnp.int32),
            self._base_key,
        )

    def can_step_record(self, needs_extra: bool = False) -> bool:
        """Whether the recording superbatch step is available.  TP needs
        the model's TP-aware record functions (``tp_record_encode`` /
        ``tp_record_extra``, psum'd over the model axis) — without them
        TP recording keeps the per-batch host loop.  Multi-host callers
        fetch their local rows via ``parallel.multihost.local_rows``.
        NOTE: the in-scan encode may reassociate vs a
        differently-partitioned run at ~1e-6 — training trajectories
        stay bitwise-equal across layouts, posterior artifacts are equal
        to float precision."""
        if not self.tp_shard_map:
            return True
        return self._tp_record_encode is not None and (
            not needs_extra or self._tp_record_extra is not None
        )

    def step_record(self, params, opt_state, x_sb, c_sb, epoch, batch_ids,
                    encode_fn, extra_fn=None):
        """Recording variant of :meth:`step`: additionally returns the
        per-batch (mean, lnvar) posteriors (and ``extra_fn`` outputs) as
        scan outputs, so a recording epoch costs one dispatch per
        superbatch instead of one per batch (reference observation
        order preserved: the posterior is taken right after each
        batch's boot updates, mmvae_alg.hh:315-317)."""
        assert self.can_step_record(needs_extra=extra_fn is not None)
        # the compiled step closes over (encode_fn, extra_fn): cache per
        # identity pair so a caller switching recorders gets a rebuild,
        # not the first call's functions silently reused.  The key holds
        # STRONG references and compares with ``is`` — an id()-based key
        # would alias a new function landing on a GC-recycled id and
        # silently reuse a step traced over the old encoder.
        rec_key = (encode_fn, extra_fn)
        if self._step_rec is not None and not (
            self._step_rec_key[0] is encode_fn
            and self._step_rec_key[1] is extra_fn
        ):
            self._step_rec = None
        if self._step_rec is None:
            self._step_rec_key = rec_key
            import functools

            sb_step = (self._superbatch_step_fast if self.fast is not None
                       else self._superbatch_step)
            record_fns = (encode_fn, extra_fn)
            if self.tp_shard_map:
                # TP: the in-scan record functions see model-axis SHARDS
                # of params/x — swap in the TP-aware pair (psum'd over
                # 'model'; outputs replicated, so the out spec gathers
                # over 'data' only)
                from jax.sharding import PartitionSpec as P

                record_fns = (
                    self._tp_record_encode,
                    self._tp_record_extra if extra_fn is not None
                    else None,
                )
                p_specs, o_specs = self._tp_specs(params, opt_state)
                extra_spec = (P(None, "data", None)
                              if extra_fn is not None else P())
                step = jax.shard_map(
                    functools.partial(sb_step, axis_name="data",
                                      record_fns=record_fns),
                    mesh=self.mesh,
                    in_specs=(p_specs, o_specs,
                              P(None, "data", "model"), P(None, "data"),
                              P(), P(), P()),
                    out_specs=(p_specs, o_specs,
                               (P(), (P(None, "data", None),
                                      P(None, "data", None)),
                                extra_spec)),
                    check_vma=False,
                )
                self._step_rec = jax.jit(step, donate_argnums=(0, 1))
            elif self.dp_shard_map:
                from jax.sharding import PartitionSpec as P

                extra_spec = (P(None, "data", None)
                              if extra_fn is not None else P())
                step = jax.shard_map(
                    functools.partial(sb_step, axis_name="data",
                                      record_fns=record_fns),
                    mesh=self.mesh,
                    in_specs=(P(), P(), P(None, "data"), P(None, "data"),
                              P(), P(), P()),
                    out_specs=(P(), P(),
                               (P(), (P(None, "data", None),
                                      P(None, "data", None)),
                                extra_spec)),
                    check_vma=False,
                )
                self._step_rec = jax.jit(step, donate_argnums=(0, 1))
            else:
                stepped = functools.partial(sb_step,
                                            record_fns=record_fns)
                if self.mesh is not None:
                    # SPMD: pin the record outputs to the batch axis so
                    # multi-host fetches see one contiguous row range
                    # per host (parallel.multihost.local_rows)
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P

                    ns = NamedSharding(self.mesh, P(None, "data", None))

                    def stepped(*args, _inner=stepped):
                        p, o, (rep, enc, extra) = _inner(*args)
                        enc = tuple(
                            jax.lax.with_sharding_constraint(e, ns)
                            for e in enc
                        )
                        if extra_fn is not None:
                            extra = jax.lax.with_sharding_constraint(
                                extra, ns
                            )
                        return p, o, (rep, enc, extra)

                self._step_rec = jax.jit(stepped, donate_argnums=(0, 1))
        return self._step_rec(
            params,
            opt_state,
            self._put(x_sb),
            self._put(c_sb, covar=True),
            jnp.float32(epoch),
            jnp.asarray(batch_ids, jnp.int32),
            self._base_key,
        )


def train_vae_model(
    forward: Callable,
    recorder,
    data_block,
    covar_block,
    opt: TrainingOptions,
    loss_fn: Callable,
    init_params,
    kl: tuple[float, float, float] = (1.0, 1e-2, 0.1),
    mesh=None,
    start_epoch: int = 0,
    init_opt_state=None,
    on_epoch_end: Callable | None = None,
    boot_loss_fn: Callable | None = None,
    report_loss_override: Callable | None = None,
    boot_loss_override: Callable | None = None,
    dp_shard_map: bool = False,
    tp_shard_map: bool = False,
    data_dim: int | None = None,
    tp_param_pspecs=None,
    tp_record_encode: Callable | None = None,
    tp_record_extra: Callable | None = None,
    fast_step=None,
    metrics_path: str | None = None,
    ondevice: bool = False,
    host_count: int = 1,
    host_id: int = 0,
    feature_perm: bool = False,
    feature_perm_apply: Callable | None = None,
) -> tuple[dict, list[float]]:
    """The high-level training loop (reference: mmvae_alg.hh:200-338).

    With ``ondevice=True`` (or auto-enabled — see below) the
    data/covariate blocks are loaded once into device-resident sparse
    (ELL) arrays and every epoch runs as a single on-device XLA
    computation (same trajectories — the PRNG schedule is identical).
    Recording epochs collect the per-batch latent posteriors as scan
    outputs, which the recorder ingests in one fetch.

    ``feature_perm_apply``: hook for models whose D-indexed state lives
    outside the params tree (the mixture's label matrix).  Called with
    the gene permutation when feature clustering engages, and called
    AGAIN with the inverse permutation at loop exit, so the caller's
    state is back in input order when this function returns.

    Returns (trained params, per-epoch mean loss vector).
    """
    ntot = data_block.ntot()
    assert ntot == covar_block.ntot(), (
        "data and covar on the same set of data points"
    )
    B = data_block.size()
    assert B == covar_block.size(), "data and covar on the same batch size"

    if host_count > 1:
        # Multi-host sharded input (SURVEY §5.8): the blocks hold this
        # host's B/H rows of every GLOBAL batch; the schedule is the
        # global one, sliced per host (each slice is a contiguous column
        # range, so reads coalesce into one BGZF seek).
        from ..parallel.multihost import sharded_batches

        assert mesh is not None, "multi-host training needs a device mesh"
        batches = sharded_batches(ntot, B * host_count, host_id,
                                  host_count)
    else:
        batches = sequential_batches(ntot, B)
    nbatch = len(batches)
    TLOG(f"Batch size = {B}{' x %d hosts' % host_count if host_count > 1 else ''}, "
         f"Number of batches = {nbatch}")

    trainer = Trainer(forward, loss_fn, opt, kl, mesh=mesh,
                      boot_loss_fn=boot_loss_fn,
                      report_loss_override=report_loss_override,
                      boot_loss_override=boot_loss_override,
                      dp_shard_map=dp_shard_map,
                      tp_shard_map=tp_shard_map,
                      data_dim=data_dim,
                      tp_param_pspecs=tp_param_pspecs,
                      tp_record_encode=tp_record_encode,
                      tp_record_extra=tp_record_extra,
                      fast_step=fast_step)
    params = init_params
    opt_state = (
        init_opt_state
        if init_opt_state is not None
        else trainer.optimizer.init(params)
    )

    loss_vec: list[float] = []
    S = max(1, opt.superbatch)
    metrics = MetricsLogger(metrics_path)
    timer = StepTimer()

    # feature-clustering permutation state (set in the dense-resident
    # branch below); every params/opt-state tree that leaves this
    # function goes through _unperm so the outside world only ever
    # sees input gene order
    _fperm = {"inv": None, "D": 0}

    def _unperm(tree):
        if _fperm["inv"] is None or tree is None:
            return tree
        return _permute_d_axes(tree, _fperm["inv"], _fperm["D"])

    # Auto-enable on-device epochs when safe: identical trajectories
    # (the PRNG schedule matches the host path — tested) and no
    # per-batch host->device traffic.  Requires in-memory data, a safe
    # padded-ELL HBM footprint, and no device mesh (the on-device epoch
    # runner is single-device).
    # DP x on-device: allowed under dp_shard_map when the schedule is
    # clean (no wrap-around, global batch divisible over the data axis)
    # and the covariate is the auto all-ones.  Multi-host additionally
    # needs the native host densifier (each host fills only its own
    # device-major row shard).
    B_global = B * host_count
    if host_count > 1:
        from jax.experimental import multihost_utils as _mhu

        from ..io import native as _native

        # ALL hosts must agree on the code path (mismatched collective
        # programs deadlock the mesh): all-gather the local capability
        # and take the minimum
        _ok = np.array([1 if _native.available() else 0])
        _mh_dense_ok = bool(np.min(np.asarray(_mhu.process_allgather(_ok))))
    else:
        _mh_dense_ok = True
    dp_ondevice_ok = (
        mesh is not None and dp_shard_map and not tp_shard_map
        and _mh_dense_ok
        and ntot % B_global == 0
        and B_global % mesh.shape["data"] == 0
    )
    # TP x on-device (VERDICT r2 item 4): the dense-resident epoch runs
    # under the 2-D ('data','model') shard_map (single host, wrap-free)
    tp_ondevice_ok = (
        mesh is not None and tp_shard_map and host_count == 1
        and ntot % B_global == 0
        and B_global % mesh.shape["data"] == 0
    )
    # set when the rotating tier was auto-enabled because the data
    # exceeds MMVAE_ONDEVICE_BYTES: the loader below must then tier on
    # the SAME budget, or a dataset between the two env budgets would
    # load fully resident despite the log promising rotation
    auto_rotate_budget = None
    if not ondevice and getattr(opt, "auto_ondevice", False) and (
        mesh is None or dp_ondevice_ok or tp_ondevice_ok
    ):
        from ..data.block import MtxMemoryBlock

        if isinstance(data_block, MtxMemoryBlock):
            # either layout qualifies: padded ELL (~6-8 B/nnz-slot) or
            # the dense-resident matrix at the block's ACTUAL value
            # dtype (4 B/element for non-integer data); the DP variant
            # needs the dense layout
            vd_item = np.dtype(
                getattr(data_block, "val_dtype", np.float32)
            ).itemsize
            ell_bytes = 8 * ntot * data_block.k_max()
            dense_bytes = vd_item * ntot * data_block.nfeature()
            budget = int(os.environ.get("MMVAE_ONDEVICE_BYTES", 4 << 30))
            need = dense_bytes if mesh is not None else min(ell_bytes,
                                                            dense_bytes)
            if 0 < need <= budget:
                TLOG(f"Auto-enabling on-device epochs "
                     f"(~{need / 1e6:,.0f} MB; "
                     "--no_auto_ondevice to disable)")
                ondevice = True
            elif (need > budget and mesh is None
                  and os.environ.get("MMVAE_ROTATE", "1") != "0"):
                # beyond-HBM: the rotating-shard tier (host-resident
                # shards double-buffered through HBM) still runs at
                # device rate — far above the streaming host loop
                TLOG(f"Auto-enabling rotating-shard on-device epochs "
                     f"(~{need / 1e6:,.0f} MB exceeds the "
                     f"{budget / 1e6:,.0f} MB resident budget; "
                     "--no_auto_ondevice or MMVAE_ROTATE=0 to disable)")
                ondevice = True
                auto_rotate_budget = budget

    epoch_runner = None
    if ondevice and mesh is not None:
        if tp_ondevice_ok and _is_all_ones(covar_block):
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..ops.densify import dp_row_permutation

            ndata = mesh.shape["data"]
            TLOG(f"Loading data on device (dense-resident, TP layout "
                 f"over (data={ndata}, model={mesh.shape['model']}))")
            perm = dp_row_permutation(ntot, B_global, ndata)
            dense = _build_dense(
                data_block, order=perm,
                sharding=NamedSharding(mesh, P("data", "model")),
            )
            epoch_runner = trainer.make_ondevice_epoch_tp(
                dense, ntot, B_global, params, opt_state,
                covar_dim=covar_block.nfeature(),
                needs_extra=(recorder is not None
                             and recorder.extra_fn is not None),
            )
        elif dp_ondevice_ok and _is_all_ones(covar_block):
            from ..ops.densify import dp_row_permutation

            ndev = mesh.shape["data"]
            TLOG(f"Loading data on device (dense-resident, DP layout "
                 f"over {ndev} devices"
                 + (f" x {host_count} hosts" if host_count > 1 else "")
                 + ")")
            perm = dp_row_permutation(ntot, B_global, ndev)
            if host_count > 1:
                # each host fills ONLY its shard of the device-major
                # layout (its devices' rows are a contiguous perm slice)
                from ..io import native

                rows_per_host = ntot // host_count
                local_order = perm[host_id * rows_per_host:
                                   (host_id + 1) * rows_per_host]
                blk = _as_memory_block(data_block)
                r_, v_, ip_ = blk.csc_arrays()
                vd = getattr(blk, "val_dtype", np.float32)
                dense = native.dense_fill(r_, v_, ip_, blk.nfeature(),
                                          vd, local_order)
            else:
                from jax.sharding import NamedSharding, PartitionSpec as P

                dense = _build_dense(
                    data_block, order=perm,
                    sharding=NamedSharding(mesh, P("data", None)),
                )
            epoch_runner = trainer.make_ondevice_epoch_dp(
                dense, ntot, B_global, covar_block.nfeature(),
                encode_fn=(recorder.encode if recorder is not None
                           else None),
                extra_fn=(recorder.extra_fn if recorder is not None
                          else None),
            )
        else:
            TLOG("on-device epochs with a mesh need --dp_shard or "
                 "--tensor_parallel, a wrap-free schedule, and the "
                 "all-ones covariate; falling back to the host loop")
            ondevice = False
    elif ondevice:
        from ..ops.densify import DeviceCSC

        # Dense-resident fast path: when N x D fits the budget, densify
        # ONCE (host-side, one native pass) and gather rows per batch
        # instead of paying the ~0.9 ms/batch ELL scatter.
        data_mem = _as_memory_block(data_block)
        vd = np.dtype(getattr(data_mem, "val_dtype", np.float32))
        dense_bytes = ntot * data_mem.nfeature() * vd.itemsize
        ell_bytes = ntot * data_mem.k_max() * (4 + vd.itemsize)
        dense_budget = int(os.environ.get("MMVAE_DENSE_BYTES", 6 << 30))
        if auto_rotate_budget is not None:
            dense_budget = min(dense_budget, auto_rotate_budget)
        covar_csc = None
        covar_dim = covar_block.nfeature()
        if not _is_all_ones(covar_block):
            covar_csc = DeviceCSC.from_memory_block(
                _as_memory_block(covar_block)
            )
        data_dense = None
        if 0 < dense_bytes <= dense_budget:
            TLOG(f"Loading data on device (dense-resident, "
                 f"{dense_bytes / 1e6:,.0f} MB {vd.name})")
            data_dense = _build_dense(data_mem)
            import types

            data_csc = types.SimpleNamespace(D=data_mem.nfeature())

            # Feature clustering (VERDICT r4 item 3): the step kernels
            # pick their lgamma path per lane tile — all counts <= 7
            # take the exact select-product fast path.  Real data
            # scatters a handful of hot genes across every tile (probe:
            # 0.6% hot genes poison 55% of tiles on the north star).
            # Reordering genes cold-first confines them to the tail
            # tiles (45% -> 95% fast tiles, -45 us/kernel measured).
            # Params/opt-state permute with the data; every artifact,
            # checkpoint, and the returned params are unpermuted back
            # to input order.  Trajectories shift by reassociation
            # only (golden-band validated).
            if (feature_perm and data_dense is not None
                    and os.environ.get("MMVAE_FEATURE_PERM", "1") != "0"
                    # _permute_d_axes permutes every axis of size D: a
                    # covariate matrix with exactly D columns would get
                    # its (unpermuted-data-facing) weight axis permuted
                    # too — skip clustering in that degenerate overlap
                    and covar_dim != data_mem.nfeature()):
                from ..ops.nb_step import _use_kernel
                Df = data_mem.nfeature()
                forced = os.environ.get("MMVAE_FEATURE_PERM") == "force"
                if _use_kernel(Df, B) or forced:
                    gmax = np.asarray(jnp.max(data_dense, axis=0))
                    hot = gmax > 7
                    frac = float(hot.mean())
                    if hot.any() and frac <= 0.5:
                        permf = np.argsort(hot, kind="stable")
                        perm_dev = jnp.asarray(permf, jnp.int32)
                        from ..ops.densify import ensure_row_major

                        data_dense = ensure_row_major(
                            jnp.take(data_dense, perm_dev, axis=1)
                        )
                        params = _permute_d_axes(params, perm_dev, Df)
                        opt_state = _permute_d_axes(opt_state, perm_dev,
                                                    Df)
                        _fperm["inv"] = jnp.asarray(np.argsort(permf),
                                                    jnp.int32)
                        _fperm["D"] = Df
                        if feature_perm_apply is not None:
                            # models with D-indexed constants OUTSIDE
                            # the params tree (the mixture's label
                            # matrix) permute them through this hook
                            feature_perm_apply(permf)
                        TLOG(f"Feature clustering: {int(hot.sum())} hot "
                             f"genes (count>7, {100 * frac:.1f}%) moved "
                             f"to the tail lane tiles (artifacts stay "
                             f"in input order; MMVAE_FEATURE_PERM=0 "
                             f"to disable)")
        elif (0 < ell_bytes <= dense_budget
              or os.environ.get("MMVAE_ROTATE", "1") == "0"):
            TLOG("Loading data on device (ELL layout)")
            data_csc = DeviceCSC.from_memory_block(data_mem,
                                                   count_dtype="auto")
        else:
            # Beyond-HBM tier (reference's out-of-core claim,
            # mmvae_io.hh:49-141, at TPU rate): neither resident layout
            # fits — rotate host-resident shards through HBM with the
            # next shard's transfer double-buffered behind compute.
            from ..data.shards import ShardStore

            # shards at ~budget/8 so the rotating buffers are a small
            # HBM tax; everything else of the budget PINS shards
            # permanently — per-epoch H2D pays only for the overflow
            # beyond HBM, not the whole dataset.  Reserve THREE shard
            # slots: at the prefetch point the loop holds the previous
            # shard (compute possibly still queued), the current
            # shard, and the next shard's in-flight transfer
            # (make_rotating_epoch's rot_reps backpressure frees the
            # one before that).
            shard_env = os.environ.get("MMVAE_SHARD_BYTES")
            shard_budget = (int(shard_env) if shard_env
                            else max(64 << 20, dense_budget // 8))
            pin_env = os.environ.get("MMVAE_PIN_BYTES")
            pin_budget = (int(pin_env) if pin_env
                          else max(0, dense_budget - 3 * shard_budget))
            store = ShardStore.build(data_mem, B,
                                     shard_budget=shard_budget,
                                     pin_budget=pin_budget)
            n_rot = store.nshards - len(store.pinned_idx)
            TLOG(f"Rotating {n_rot}/{store.nshards} host-resident "
                 f"shards through HBM ({len(store.pinned_idx)} pinned; "
                 f"{store.layout} layout, "
                 f"~{store.shard_bytes(0) / 1e6:,.0f} MB/shard; "
                 f"dense {dense_bytes / 1e6:,.0f} MB and ELL "
                 f"{ell_bytes / 1e6:,.0f} MB both exceed "
                 f"MMVAE_DENSE_BYTES={dense_budget / 1e6:,.0f} MB)")
            epoch_runner = trainer.make_rotating_epoch(
                store, covar_csc, ntot, B, covar_dim,
                encode_fn=(recorder.encode if recorder is not None
                           else None),
                extra_fn=(recorder.extra_fn if recorder is not None
                          else None),
            )
        if epoch_runner is None:
            epoch_runner = trainer.make_ondevice_epoch(
                data_csc, covar_csc, ntot, B, covar_dim,
                encode_fn=(recorder.encode if recorder is not None
                           else None),
                extra_fn=(recorder.extra_fn if recorder is not None
                          else None),
                data_dense=data_dense,
            )

    # device trace of the whole training phase when MMVAE_TRACE_DIR is
    # set (SURVEY §5.1; no-op otherwise)
    _trace_scope = contextlib.ExitStack()
    _trace_scope.enter_context(trace())

    # Batched epoch-loss fetching for on-device epochs: each per-epoch
    # `np.asarray(rep)` sync costs a full tunnel drain (~90 ms/epoch
    # measured against 599 ms of device work at the north star), so
    # when nobody needs the loss line live — stderr is not a TTY, no
    # per-epoch callback, single host — the rep HANDLES are collected
    # and fetched in groups of MMVAE_REPORT_EVERY (default 8) with ONE
    # stacked transfer.  Loss VALUES and scores.gz are unchanged; the
    # stderr lines appear in groups with group-averaged cells/sec.
    _defer: list[dict] = []
    _defer_every = 1
    if (not sys.stderr.isatty() and on_epoch_end is None
            and jax.process_count() == 1):
        _defer_every = getattr(opt, "report_every", 0) or max(
            1, int(os.environ.get("MMVAE_REPORT_EVERY", "8"))
        )
    elif getattr(opt, "report_every", 0) > 1:
        # the user explicitly asked for batched fetches but a gate
        # forces the synchronous path — say which one, don't be silent
        why = ("stderr is a TTY (live loss line needs per-epoch sync)"
               if sys.stderr.isatty() else
               "per-epoch checkpoint callback is active"
               if on_epoch_end is not None else
               "multi-host run")
        TLOG(f"--report_every {opt.report_every} ignored: {why}")
    _group_t0 = [time.time()]
    _seen_record = [False]

    def _drain_deferred():
        if not _defer:
            _group_t0[0] = time.time()
            return
        # stack the per-batch rep VECTORS and mean on the HOST so the
        # loss values are bitwise identical to the synchronous path's
        # np.asarray(rep).mean() — one (k, nbatch) transfer either way
        reps = np.asarray(jnp.stack([d["rep"] for d in _defer]))
        dt = max(time.time() - _group_t0[0], 1e-9) / len(_defer)
        for d, row in zip(_defer, reps):
            epoch_loss = float(row.mean())
            loss_vec.append(epoch_loss)
            TLOG(
                f"[{d['epoch'] + 1:>20}] {epoch_loss:>20.6f}"
                f"  ({nbatch * B / dt:,.0f} cells/sec, on-device)"
            )
            metrics.log_epoch(
                d["epoch"], loss=epoch_loss,
                kl_weight=float(kl_weight_schedule(
                    d["epoch"], kl[0], kl[1], kl[2])),
                cells_per_sec=round(nbatch * B / dt, 1), ondevice=True,
                **{f"time_{k}": round(v, 4)
                   for k, v in d["timer"].items()},
            )
        _defer.clear()
        _group_t0[0] = time.time()

    # the final drain/flush MUST also run on an exception or
    # KeyboardInterrupt mid-group, or up to report_every-1 completed
    # epochs' loss lines and metrics rows would be silently lost
    try:
        for epoch in range(start_epoch, opt.max_epoch):
            t0 = time.time()
            timer.reset()
            recording_now = (epoch + 1) % opt.recording == 0
            reports = []

            record_now = recording_now and recorder is not None
            if epoch_runner is not None and (
                not record_now or epoch_runner.can_record
            ):
                if _defer_every > 1 and not _defer:
                    # fresh report group: start its clock HERE so time spent
                    # in an interleaved host-path epoch (or a drain) is not
                    # attributed to the group's cells/sec
                    _group_t0[0] = time.time()
                with timer.phase("step"), annotate("ondevice_epoch"):
                    params, opt_state, out = epoch_runner(
                        params, opt_state, epoch, record=record_now
                    )
                if record_now:
                    rep, enc, extra = out
                    if jax.process_count() > 1:
                        # fetch only this host's rows; `batches` is already
                        # the host-local schedule (sharded_batches)
                        from ..parallel.multihost import local_rows

                        enc = (local_rows(enc[0]), local_rows(enc[1]))
                        if recorder.extra_fn is not None:
                            extra = local_rows(extra)
                    with timer.phase("record_submit"):
                        # non-blocking: the writer thread fetches the
                        # posteriors (syncing on this epoch's device
                        # compute there) and writes artifacts while the
                        # next epoch runs
                        recorder.submit_epoch(
                            batches, enc,
                            extra if recorder.extra_fn is not None else None,
                            _unperm(params), epoch,
                        )
                else:
                    rep = out
                if _defer_every > 1:
                    _defer.append(dict(epoch=epoch, rep=rep,
                                       timer=timer.summary()))
                    # the first epoch AND the first recording epoch drain
                    # alone: each carries a one-time compile (the plain and
                    # the record-variant epoch program) that would otherwise
                    # pollute its whole group's reported throughput
                    first_rec = record_now and not _seen_record[0]
                    if record_now:
                        _seen_record[0] = True
                    if len(_defer) >= _defer_every \
                            or epoch == opt.max_epoch - 1 \
                            or epoch == start_epoch or first_rec:
                        _drain_deferred()
                    continue
                epoch_loss = float(np.asarray(rep).mean())
                loss_vec.append(epoch_loss)
                dt = time.time() - t0
                TLOG(
                    f"[{epoch + 1:>20}] {epoch_loss:>20.6f}"
                    f"  ({nbatch * B / dt:,.0f} cells/sec, on-device)"
                )
                metrics.log_epoch(
                    epoch, loss=epoch_loss,
                    kl_weight=float(kl_weight_schedule(epoch, kl[0], kl[1], kl[2])),
                    cells_per_sec=round(nbatch * B / dt, 1), ondevice=True,
                    **{f"time_{k}": round(v, 4)
                       for k, v in timer.summary().items()},
                )
                if on_epoch_end is not None:
                    on_epoch_end(epoch, _unperm(params),
                                 _unperm(opt_state), loss_vec)
                continue
            # host-path epoch (e.g. recording without step-record support):
            # flush any deferred on-device reports first so loss_vec stays
            # in epoch order
            _drain_deferred()

            # Recording epochs: when the superbatch record step is available
            # (single host, no TP) the posteriors ride as scan outputs of the
            # jitted step — recording costs like training.  Otherwise fall
            # back to one batch per dispatch so the recorder sees the model
            # right after each batch's updates (mmvae_alg.hh:315-317).
            fast_record = (recording_now and recorder is not None
                           and trainer.can_step_record(
                               needs_extra=recorder.extra_fn is not None))
            S_eff = 1 if (recording_now and recorder is not None
                          and not fast_record) else S
            # reference-style live `\r[batch] loss` line (mmvae_alg.hh:283):
            # interactive primary-host runs only — reading the loss forces a
            # per-superbatch device sync that pipelined runs must not pay.
            # Rate-limited to ~1 Hz so an interactive run pays at most one
            # ~27 ms tunnel sync per second instead of one per superbatch
            # (which measured as a ~40% throughput cliff keyed on isatty).
            _live_batch_display = (
                sys.stderr.isatty() and jax.process_index() == 0
            )
            _live_last_t = 0.0

            loader = PrefetchLoader(data_block, covar_block, batches,
                                    depth=2 * S_eff)
            buf: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
            counter = 0

            def flush():
                nonlocal params, opt_state, counter, _live_last_t
                if not buf:
                    return
                with timer.phase("step"), annotate("train_step"):
                    x_sb = np.stack([b[1] for b in buf])
                    c_sb = np.stack([b[2] for b in buf])
                    ids = np.arange(counter, counter + len(buf))
                    if fast_record:
                        params, opt_state, (rep, enc, extra) = (
                            trainer.step_record(
                                params, opt_state, x_sb, c_sb, epoch, ids,
                                recorder.encode, recorder.extra_fn,
                            )
                        )
                    else:
                        params, opt_state, rep = trainer.step(
                            params, opt_state, x_sb, c_sb, epoch, ids
                        )
                    reports.append(rep)
                if _live_batch_display:
                    # reference per-batch progress line (mmvae_alg.hh:283-284)
                    # — TTY-only AND rate-limited, because reading `rep` here
                    # forces a device sync the pipelined path must not pay
                    nonlocal_now = time.monotonic()
                    if nonlocal_now - _live_last_t >= 1.0:
                        sys.stderr.write(
                            f"\r[{counter + len(buf):>20}] "
                            f"{float(np.asarray(rep)[-1]):>20.6f}"
                        )
                        _live_last_t = nonlocal_now
                if fast_record:
                    with timer.phase("record"):
                        extra = (extra if recorder.extra_fn is not None
                                 else None)
                        if jax.process_count() > 1:
                            # each host ingests its own rows; `buf` already
                            # carries the host-local batch slices
                            from ..parallel.multihost import local_rows

                            enc = (local_rows(enc[0]), local_rows(enc[1]))
                            if extra is not None:
                                extra = local_rows(extra)
                        recorder.ingest(np.stack([b[0] for b in buf]), enc,
                                        extra)
                elif recording_now and recorder is not None:
                    with timer.phase("record"):
                        for bidx, x, _ in buf:
                            recorder.update_on_batch(params, x, bidx)
                counter += len(buf)
                buf.clear()

            with timer.phase("input"), annotate("input_pipeline"):
                it = iter(loader)
            while True:
                with timer.phase("input"):
                    item = next(it, None)
                if item is None:
                    break
                buf.append(item)
                if len(buf) == S_eff:
                    flush()
            flush()

            if _live_batch_display:
                sys.stderr.write("\r")  # clear the batch line (alg.hh:323)
            epoch_losses = np.concatenate([np.asarray(r) for r in reports])
            epoch_loss = float(epoch_losses.mean())
            loss_vec.append(epoch_loss)
            dt = time.time() - t0
            TLOG(
                f"[{epoch + 1:>20}] {epoch_loss:>20.6f}"
                f"  ({nbatch * B / dt:,.0f} cells/sec)"
            )
            metrics.log_epoch(
                epoch,
                loss=epoch_loss,
                kl_weight=float(
                    kl_weight_schedule(epoch, kl[0], kl[1], kl[2])
                ),
                cells_per_sec=round(nbatch * B / dt, 1),
                **{f"time_{k}": round(v, 4) for k, v in timer.summary().items()},
            )

            if recording_now and recorder is not None:
                recorder.update_on_epoch(_unperm(params), epoch)
            if on_epoch_end is not None:
                on_epoch_end(epoch, _unperm(params),
                             _unperm(opt_state), loss_vec)

    finally:
        _trace_scope.close()
        _drain_deferred()  # safety net: epoch==max_epoch-1 already drains
        if recorder is not None and hasattr(recorder, "flush"):
            recorder.flush()  # join background artifact writes
        if _fperm["inv"] is not None and feature_perm_apply is not None:
            # restore the caller's D-indexed external state (the
            # mixture's label matrix, fast-step caches) to input gene
            # order — without this, a second train on the same model
            # object would permute on top of an already-permuted label
            feature_perm_apply(np.asarray(_fperm["inv"]))
    TLOG("Done training")
    return _unperm(params), loss_vec


def _permute_d_axes(tree, perm_dev, D: int):
    """Permute every axis of size ``D`` in every array leaf.

    The shape rule is safe for the feature permutation's D >= 512 gate:
    no model dimension (latents, batch, stacked-row counts) reaches it,
    and the clustering gate skips datasets whose covariate count equals
    D (the one user-controlled dimension that could collide).  Used by
    the feature-clustering permutation and its inverse
    (artifact/checkpoint canonicalization)."""
    def f(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        out = leaf
        for ax, s in enumerate(leaf.shape):
            if s == D:
                out = jnp.take(jnp.asarray(out), perm_dev, axis=ax)
        return out

    return jax.tree_util.tree_map(f, tree)


def _build_dense(block, order=None, sharding=None):
    """Dense (nrows, D) device array from a data block's CSC arrays, in
    the narrowest lossless dtype — host-side native fill + one transfer
    when the extension is available, device-side ELL materialize
    otherwise.  ``sharding`` places the array directly (avoids staging
    the full matrix on one device before a DP re-shard)."""
    from ..io import native
    from ..ops.densify import ensure_row_major

    blk = _as_memory_block(block)
    rows, vals, indptr = blk.csc_arrays()
    vd = getattr(blk, "val_dtype", np.float32)
    if native.available():
        host = native.dense_fill(rows, vals, indptr, blk.nfeature(), vd,
                                 order)
        if sharding is not None:
            return jax.device_put(host, sharding)
        return jnp.asarray(host)
    from ..ops.densify import DeviceCSC, materialize_dense

    csc = DeviceCSC.from_memory_block(blk, count_dtype="auto")
    # relayout HERE (not just in the epoch runners) so the column-major
    # jit output is dropped immediately instead of staying referenced
    # next to its row-major copy for the whole run
    dense = ensure_row_major(materialize_dense(csc, order=order))
    if sharding is not None:
        dense = ensure_row_major(jax.device_put(dense, sharding))
    return dense


def _as_memory_block(block):
    """Coerce a data block to an in-memory block (needed for on-device
    loading of an out-of-core block)."""
    from ..data.block import MtxDataBlock, MtxMemoryBlock

    if isinstance(block, MtxDataBlock):
        return MtxMemoryBlock(block.mtx_file, block.idx_file, block.B)
    return block


def _is_all_ones(covar_block) -> bool:
    """True ONLY for the auto-generated 1 x N all-ones covariate
    (create_ones_like, mmvae_io.hh:293-310), signalled explicitly by
    the creator (prepare_blocks sets ``auto_ones``).  A content probe
    is NOT used: a real covariate whose sampled entries happen to be
    1.0 must never be silently replaced by a constant."""
    return bool(getattr(covar_block, "auto_ones", False))


def visit_data(visitor, data_block) -> None:
    """Model-free whole-dataset sweep (reference: visit_data,
    mmvae_alg.hh:127-160): batch loop -> read -> visitor.update_on_batch
    -> clear.  The scaffold behind post-hoc dataset passes that need no
    parameters (e.g. statistics collectors)."""
    ntot = data_block.ntot()
    B = data_block.size()
    batches = sequential_batches(ntot, B)
    TLOG(f"Batch size = {B}, Number of batches = {len(batches)}")
    for batch in batches:
        data_block.clear()
        x = data_block.read(batch)
        visitor.update_on_batch(x, batch)
    TLOG("Done visit")


def visit_vae_model(encode_fn, params, visitor, data_block) -> None:
    """Whole-dataset sweep without training (reference:
    visit_vae_model, mmvae_alg.hh:162-198)."""
    ntot = data_block.ntot()
    B = data_block.size()
    batches = sequential_batches(ntot, B)
    TLOG(f"Batch size = {B}, Number of batches = {len(batches)}")
    for batch in batches:
        data_block.clear()
        x = data_block.read(batch)
        visitor.update_on_batch(params, x, batch)
    TLOG("Done visit")
