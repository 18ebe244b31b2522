"""Sample-quality diagnostics: normalized perplexity and effective sample
size.

API parity with the reference's ``pypmc/tools/convergence.py``; implemented
with jax so the reductions run fused on device and are ``psum``-friendly when
the weights are sharded over the particle axis.
"""

import jax.numpy as jnp

__all__ = ["perp", "ess"]


def perp(weights):
    r"""Normalized perplexity :math:`\mathcal{P} = \exp(H)/N` of (unnormalized)
    importance ``weights``; 0 is terrible, 1 is perfect.
    (Reference: ``convergence.py:6-39``.)"""
    w = jnp.asarray(weights)
    # pre-normalize by the max: jnp silently downcasts float64 to float32
    # (x64 off), where raw weights > 3.4e38 overflow to inf and the
    # diagnostics return NaN; the max-ratio form is scale-free
    w = w / jnp.max(w)
    w = w / jnp.sum(w)
    # avoid NaN from log(0) by replacing log(0) -> 0 contribution
    logw = jnp.where(w == 0, 0.0, jnp.log(jnp.where(w == 0, 1.0, w)))
    entr = -jnp.sum(w * logw)
    return jnp.exp(entr) / len(w)


def ess(weights):
    r"""Normalized effective sample size :math:`1/(1+C^2)` [LC95] of
    (unnormalized) importance ``weights``; 0 is terrible, 1 is perfect.
    (Reference: ``convergence.py:42-72``.)"""
    w = jnp.asarray(weights)
    w = w / jnp.max(w)  # scale-free (see perp): no float32 overflow
    w = w / jnp.sum(w)
    coeff_var = jnp.sum((len(w) * w - 1.0) ** 2) / len(w)
    return 1.0 / (1.0 + coeff_var)
