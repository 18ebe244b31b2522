"""Minimal lexicographic integer partition and data patching.

API parity with the reference's ``pypmc/density/_partition.py``.
"""

import numpy as _np

from .gauss import Gauss
from .mixture import MixtureDensity

import logging

logger = logging.getLogger(__name__)

__all__ = ["partition", "patch_data"]


def partition(N, k):
    """Distribute ``N`` into ``k`` parts such that each part takes the value
    ``N//k`` or ``N//k + 1`` (minimal lexicographic integer partition).

    Example: ``N=5, k=2 --> [3, 2]``.  (Reference: ``_partition.py:12-24``.)
    """
    out = [N // k] * k
    for i in range(N % k):
        out[i] += 1
    return out


def _patch_component(patch, index, try_diag):
    """One Gauss from a patch's empirical moments, or None.  A non-PD
    covariance falls back to its diagonal when ``try_diag`` (the patch may
    be too short or degenerate for a full-rank estimate)."""
    if len(patch) < 2:
        # a single-row patch has no covariance estimate at all (np.cov
        # collapses to a 0-d scalar); drop it like any invalid patch
        logger.info("patch %i: too short for a covariance estimate (%d "
                    "row(s)); dropped", index, len(patch))
        return None
    mean = _np.mean(patch, axis=0)
    cov = _np.cov(patch, rowvar=0)
    try:
        return Gauss(mean, cov)
    except _np.linalg.LinAlgError as full_err:
        logger.info("patch %i: full covariance rejected (%r)",
                    index, full_err)
    if not try_diag:
        return None
    try:
        component = Gauss(mean, _np.diag(_np.diag(cov)))
        logger.info("patch %i: using the diagonal of the covariance", index)
        return component
    except _np.linalg.LinAlgError as diag_err:
        logger.info("patch %i: diagonal covariance rejected too (%r)",
                    index, diag_err)
        return None


def patch_data(data, L=100, try_diag=True):
    """Cut ``data`` (e.g. Markov-chain output) into consecutive patches of
    length ``L`` and return a Gaussian mixture with one component per patch,
    carrying the patch's empirical mean and covariance.  Patches without a
    valid covariance use the diagonal (if ``try_diag``) or are dropped.
    (Same contract as the reference ``_partition.py:26-89``.)
    """
    data = _np.asarray(data)
    dropped = []
    components = []
    for i, start in enumerate(range(0, len(data), L)):
        component = _patch_component(data[start:start + L], i, try_diag)
        if component is None:
            dropped.append(i)
        else:
            components.append(component)

    if dropped:
        logger.warning("dropped patches without a valid covariance: %s",
                       dropped)
    return MixtureDensity(components)
