"""Target-density adapters.

A target is a callable ``x (D,) -> log P(x)``.  On TPU, evaluating a
per-sample callable with ``vmap`` lowers quadratic forms to matmuls with tiny
(D, D) matrices against the huge particle axis, which are MXU-latency-bound
(~100x slower than the fused mixture kernels).  Marking a target as
*batched* -- a callable ``x (N, D) -> (N,)`` -- lets the samplers call it
directly so the author can use layouts/kernels that scale.
"""

import jax

__all__ = ["batched_target", "is_batched", "evaluate_target"]


def batched_target(fn):
    """Mark ``fn`` as a batched log-target: it receives the full ``(N, D)``
    sample block and returns ``(N,)`` log-densities.  Use this (or
    :meth:`MixtureDensity.evaluate_fn(batched=True)
    <pypmc_tpu.density.mixture.MixtureDensity.evaluate_fn>`) for the TPU fast
    path."""
    fn.__pypmc_tpu_batched__ = True
    return fn


def is_batched(fn) -> bool:
    return getattr(fn, "__pypmc_tpu_batched__", False)


def evaluate_target(target, samples):
    """Evaluate ``target`` on an ``(N, D)`` sample block: directly if it is
    a batched target, via ``vmap`` otherwise."""
    if is_batched(target):
        return target(samples)
    return jax.vmap(target)(samples)
