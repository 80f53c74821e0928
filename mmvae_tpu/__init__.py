"""mmvae_tpu — a TPU-native (JAX/XLA/Pallas) framework for training
variational autoencoders on single-cell genomics count matrices that are
too big to load naively.

This is a ground-up TPU-first rebuild of the capabilities of the
C++/LibTorch reference `YPARK/mm-vae`:

- Out-of-core minibatching over BGZF-compressed MatrixMarket files via a
  column -> virtual-offset index (reference: include/mmutil_index.hh,
  include/mmutil_bgzf_util.hh, include/mmvae_io.hh), reimplemented as a
  host-side native (C++) block reader with async prefetch feeding
  sharded `jax.Array`s.
- Negative-binomial, von Mises-Fisher, joint NB+vMF, and labeled-mixture
  VAEs (reference: include/models/*.hh) as pure-function JAX models whose
  whole ELBO fuses into a single XLA computation.
- Training loop with KL annealing, bootstrap-resampled gradient steps,
  Adam + global-norm clipping (reference: include/mmvae_alg.hh), jitted
  end to end with `lax.scan` over batches.
- Data/tensor parallelism over a `jax.sharding.Mesh` (new; the reference
  is single-process single-device).
"""

__version__ = "0.1.0"
