"""Hierarchical Gaussian-mixture reduction ([GR04]).

Re-design of the reference's ``pypmc/mix_adapt/hierarchical.py``: the
regroup step computes the full ``(nin, nout)`` KL-divergence matrix in one
batched computation (instead of a double Python loop) and the refit step is a
set of segment-sum moment matches.
"""

import copy as _copy

import jax
import jax.numpy as jnp
import numpy as _np

from ..density.mixture import MixtureDensity, recover_gaussian_mixture as _unroll
from ..ops.linalg import chol_inv_det

import logging

logger = logging.getLogger(__name__)

__all__ = ["Hierarchical", "kullback_leibler", "kl_divergence_matrix"]


@jax.jit
def kl_divergence_matrix(mu1, cov1, mu2, cov2):
    """Pairwise Gaussian KL divergences ``KL(f_i || g_j)`` as an
    ``(nin, nout)`` matrix; one batched computation over all pairs."""
    res2 = chol_inv_det(cov2)  # (nout,...)
    _, log_det1 = jnp.linalg.slogdet(cov1)
    d = res2.log_det[None, :] - log_det1[:, None]
    # trace(inv2_j . cov1_i)
    d = d + jnp.einsum("jab,iba->ij", res2.inv, cov1)
    diff = mu1[:, None, :] - mu2[None, :, :]  # (nin, nout, D)
    d = d + jnp.einsum("ija,jab,ijb->ij", diff, res2.inv, diff)
    d = d - mu1.shape[1]
    return 0.5 * d


def kullback_leibler(c1, c2):
    """Kullback-Leibler divergence ``KL(1||2)`` of two Gaussian components.
    (Reference: ``hierarchical.py:221-229``.)"""
    d = c2.log_det_sigma - c1.log_det_sigma
    d += _np.trace(c2.inv_sigma.dot(c1.sigma))
    mean_diff = c1.mu - c2.mu
    d += mean_diff.dot(c2.inv_sigma).dot(mean_diff)
    d -= len(c1.mu)
    return 0.5 * d


class Hierarchical(object):
    """Hierarchical clustering of Gaussian mixtures as in [GR04]: find a
    mixture ``g`` with fewer components that most closely matches the input
    mixture ``f``, by EM alternation of a *regroup* (argmin-KL assignment)
    and a *refit* (moment-matched merge) step.
    (Reference: ``mix_adapt/hierarchical.py:11-219``.)

    :param input_components: Gaussian
        :class:`~pypmc_tpu.density.mixture.MixtureDensity`; the mixture to
        be reduced.
    :param initial_guess: Gaussian
        :class:`~pypmc_tpu.density.mixture.MixtureDensity`; initial guess
        for the output, defines the maximum number of components.
    """

    def __init__(self, input_components, initial_guess):
        self.nin = len(input_components.components)
        self.nout = len(initial_guess.components)

        assert self.nin > self.nout, (
            "Got more output (%i) than input (%i) components" % (self.nout, self.nin)
        )
        assert self.nout > 0, "Invalid number of output components %s" % self.nout

        self.f = input_components
        self.g = _copy.deepcopy(initial_guess)

        # several inputs can map to one output
        self.inv_map = {j: None for j in range(self.nout)}
        self.min_kl = _np.zeros(self.nin) + _np.inf

        # stacked input parameters (static during the run)
        means, covs, weights = _unroll(self.f)
        self._f_means = jnp.asarray(means)
        self._f_covs = jnp.asarray(covs)
        self._f_weights = _np.asarray(weights)

    def _cleanup(self, kill):
        """Remove dead components (weight 0) if ``kill``."""
        if kill:
            removed_indices = self.g.prune()
            self.nout -= len(removed_indices)
            if removed_indices:
                logger.info("Removing %s" % removed_indices)
            for j in removed_indices:
                self.inv_map.pop(j[0])
            # reindex the inverse map to the new component numbering
            self.inv_map = {j: m for j, m in enumerate(
                v for _, v in sorted(self.inv_map.items())
            )}

    def _distance(self):
        r"""Distance function :math:`d(f, g, \pi)`, Eq. (3) in [GR04]."""
        return _np.average(self.min_kl, weights=self._f_weights)

    def _regroup(self):
        """Update the map pi keeping g fixed: assign each input component to
        the output component with smallest KL (Eq. (7) in [GR04]); the whole
        ``(nin, nout)`` KL matrix is one batched computation."""
        g_means, g_covs, _ = _unroll(self.g)
        kl = _np.asarray(
            kl_divergence_matrix(
                self._f_means, self._f_covs, jnp.asarray(g_means), jnp.asarray(g_covs)
            )
        )
        j_min = _np.argmin(kl, axis=1)
        self.min_kl = kl[_np.arange(self.nin), j_min]
        for j in range(self.nout):
            self.inv_map[j] = list(_np.flatnonzero(j_min == j))

    def _refit(self):
        """Update g keeping the map pi fixed: moment-matched merge of each
        output component's group (Eq. (7) and below in [GR04])."""
        f_means = _np.asarray(self._f_means)
        f_covs = _np.asarray(self._f_covs)
        for j, c in enumerate(self.g.components):
            members = self.inv_map[j]
            if not members:
                self.g.weights[j] = 0.0
                continue
            w = self._f_weights[members]
            total = w.sum()
            self.g.weights[j] = total
            mean = _np.einsum("i,id->d", w, f_means[members]) / total
            diff = mean[None, :] - f_means[members]
            cov = _np.einsum("i,iab->ab", w, f_covs[members])
            cov += _np.einsum("i,ia,ib->ab", w, diff, diff)
            cov /= total
            c.update(mean, cov)

    def run(self, eps=1e-4, kill=True, max_steps=50):
        r"""Perform the clustering; the result is in ``self.g``.  Return the
        number of iterations at convergence, or None.

        :param eps: declare convergence when the relative change of the
            distance falls below ``eps``.
        :param kill: remove output components with zero weight.
        :param max_steps: maximum number of update steps.
        """
        old_distance = _np.finfo(_np.float64).max
        new_distance = _np.finfo(_np.float64).max

        logger.info(
            "Starting hierarchical clustering with %d components." % len(self.g.components)
        )
        converged = False
        step = 0
        for step in range(1, max_steps + 1):
            self._cleanup(kill)
            self._regroup()
            self._refit()

            new_distance = self._distance()
            assert new_distance >= 0, "Found non-positive distance %d" % new_distance

            logger.info("Distance in step %d: %g" % (step, new_distance))
            if new_distance == old_distance:
                converged = True
                logger.info("Exact minimum found after %d steps" % step)
                break

            rel_change = (old_distance - new_distance) / old_distance
            assert not (rel_change < -1e-13), "distance increased"

            if rel_change < eps and not converged and step > 0:
                converged = True
                if new_distance != old_distance:
                    logger.info("Close enough to local minimum after %d steps" % step)
                break

            old_distance = new_distance

        self._cleanup(kill)
        logger.info("%d components remain." % len(self.g.components))

        if converged:
            return step
        return None
