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


def patch_data(data, L=100, try_diag=True):
    """Patch ``data`` (e.g. Markov-chain output) into parts of length ``L``
    and return a Gaussian mixture where each component gets the empirical
    mean and covariance of one patch.  Patches whose covariance is invalid
    fall back to the diagonal (if ``try_diag``) or are skipped.
    (Reference: ``_partition.py:26-89``.)
    """
    data = _np.asarray(data)
    patches = [data[start : start + L] for start in range(0, len(data), L)]

    components = []
    skipped = []
    for i, patch in enumerate(patches):
        mean = _np.mean(patch, axis=0)
        cov = _np.cov(patch, rowvar=0)
        try:
            components.append(Gauss(mean, cov))
        except _np.linalg.LinAlgError as error1:
            logger.info("Could not form Gauss from patch %i. Reason: %s" % (i, repr(error1)))
            if try_diag:
                cov = _np.diag(_np.diag(cov))
                try:
                    components.append(Gauss(mean, cov))
                    logger.info("Diagonal covariance attempt succeeded.")
                except _np.linalg.LinAlgError as error2:
                    skipped.append(i)
                    logger.info(
                        "Diagonal covariance attempt failed. Reason: %s" % repr(error2)
                    )
            else:
                skipped.append(i)

    if skipped:
        logger.warning("Could not form Gaussians from: %s" % skipped)

    return MixtureDensity(components)
