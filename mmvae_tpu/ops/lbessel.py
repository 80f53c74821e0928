"""log modified Bessel function of the first kind, with a custom gradient.

The vMF likelihood needs ``log I_df(kappa)``.  The reference implements
it as a hand-written LibTorch autograd node (reference:
include/operators.hh:13-101); here it is a one-screen
``jax.custom_vjp``:

- Forward: the Oh-Adamczewski-Park (2019) two-regime approximation
  (operators.hh:58-80).
- Backward: the *midpoint of the Baricz (2011) ratio bounds*, NOT the
  analytic derivative (operators.hh:28-39).  Matching the reference's
  training trajectories requires copying this bound, so we do.

The reference evaluates ``lgamma(df+1)`` with Mineiro's bit-twiddling
``fasterlgamma`` (operators.hh:75); we reproduce that value bit-exactly
(ops/fastmath.py) so reported losses match the reference's numbers —
the term is a constant in ``kappa``, so gradients are unaffected either
way.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def lbessel(kappa: jax.Array, df: float) -> jax.Array:
    """log I_df(kappa), elementwise over ``kappa``; ``df`` is static."""
    return _lbessel_fwd_value(kappa, df)


def _lbessel_fwd_value(kappa, df):
    nu = float(df)
    eta = (nu + 0.5) / (2.0 * (nu + 1.0))
    # regime kappa <= nu (operators.hh:59-63)
    from .fastmath import fasterlgamma

    stuff1 = (
        nu * jnp.log(kappa)
        + eta * kappa
        - (eta + nu) * math.log(2.0)
        - fasterlgamma(nu + 1.0)
    )
    # regime kappa > nu (operators.hh:64-67)
    stuff2 = kappa - 0.5 * jnp.log(kappa) - 0.5 * math.log(2.0 * math.pi)
    return jnp.where(kappa <= nu, stuff1, stuff2)


def _fwd(kappa, df):
    return _lbessel_fwd_value(kappa, df), kappa


def _bwd(df, kappa, g):
    # Baricz et al. (2011) Lemma B ratio bounds; gradient = bound midpoint
    # (operators.hh:28-39).
    nu = float(df)
    lb = jnp.sqrt(kappa * kappa * nu / (nu + 1.0) + nu * nu)
    ub = jnp.sqrt(kappa * kappa + nu * nu)
    return (g * 0.5 * (lb + ub) / kappa,)


lbessel.defvjp(_fwd, _bwd)
