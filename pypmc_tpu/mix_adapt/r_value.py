"""Gelman-Rubin R value [GR92] and chain grouping.

API parity with the reference's ``pypmc/mix_adapt/r_value.py``: group Markov
chains by their common R value and build a Gaussian or Student-t mixture from
"long patches" of the grouped chains [BC13].
"""

import numpy as _np

from ..density import partition as _part
from ..density.mixture import create_gaussian_mixture as _mkgauss
from ..density.mixture import create_t_mixture as _mkt

__all__ = ["r_value", "r_group", "make_r_gaussmix", "make_r_tmix"]


def r_value(means, variances, n, approx=False):
    """Calculate the Gelman-Rubin R value (Chapter 2.2 in [GR92]) of ``m``
    chains from their sample ``means`` and sample ``variances`` (defined in
    ONE dimension), based on ``n`` samples per chain.  ``approx`` neglects
    the d.o.f. correction.  (Reference: ``r_value.py:25-89``.)"""
    means = _np.asarray(means)
    variances = _np.asarray(variances)

    assert means.ndim == 1, "``means`` must be vector-like"
    assert variances.ndim == 1, "``variances`` must be vector-like"
    assert len(means) == len(variances), (
        "Number of ``means`` (%i) does not match number of ``variances`` (%i)"
        % (len(means), len(variances))
    )

    m = len(means)

    x_bar = _np.average(means)
    B_over_n = ((means - x_bar) ** 2).sum() / (m - 1)
    W = _np.average(variances)

    var_estimate = (n - 1) / n * W + B_over_n

    if approx:
        return var_estimate / W

    V = var_estimate + B_over_n / m

    # the three terms of var(V), equation (4) in [GR92]
    tmp_cov_matrix = _np.cov(variances, means)
    var_V = _np.cov(variances, means**2)[1, 0] - 2.0 * x_bar * tmp_cov_matrix[1, 0]
    var_V *= 2.0 * (m + 1) * (n - 1) / (m * m * n)
    var_V += ((m + 1) / m) ** 2 * 2.0 / (m - 1) * B_over_n * B_over_n
    var_V += ((n - 1) / n) ** 2 / m * tmp_cov_matrix[0, 0]

    df = 2.0 * V**2 / var_V

    if df <= 2.0:
        return _np.inf

    return V / W * df / (df - 2)


def r_group(means, variances, n, critical_r=2.0, approx=False):
    """Group chains whose common :func:`r_value` is less than ``critical_r``
    in every dimension; greedy assignment in input order.
    (Reference: ``r_value.py:99-139``.)"""
    assert len(means) == len(variances), (
        "Number of ``means`` (%i) does not match number of ``variances`` (%i)"
        % (len(means), len(variances))
    )
    means = _np.asarray(means)
    variances = _np.asarray(variances)
    assert means.ndim == 2, "``means`` must be matrix-like"
    assert variances.ndim == 2, "``variances`` must be 2-dimensional"
    assert means.shape[1] == variances.shape[1], (
        "Dimensionality of ``means`` (%i) and ``variances`` (%i) does not match"
        % (means.shape[1], variances.shape[1])
    )

    groups = []
    for i in range(len(means)):
        assigned = False
        for group in groups:
            rows = group + [i]
            r_values = _np.array(
                [
                    r_value(means[rows, j], variances[rows, j], n, approx)
                    for j in range(means.shape[1])
                ]
            )
            if _np.all(r_values < critical_r):
                group.append(i)
                assigned = True
                break
        if not assigned:
            groups.append([i])

    return groups


def _make_r_patches(data, K_g, critical_r, indices, approx):
    """Group chains by R value and split each group into ``K_g`` patches;
    return patch means and covariances.  (Reference: ``r_value.py:141-199``.)"""

    def append_components(means, covs, data, partition):
        subdata_start = 0
        for len_subdata in partition:
            subdata = data[subdata_start : subdata_start + len_subdata]
            means.append(_np.mean(subdata, axis=0))
            covs.append(_np.cov(subdata, rowvar=0))
            subdata_start += len_subdata

    n = len(data[0])
    for item in data:
        assert len(item) == n, "Every chain must bring the same number of points."

    data = [_np.asarray(d) for d in data]

    if indices is None:
        indices = _np.arange(data[0].shape[1])
    assert len(indices) > 0, (
        "Invalid specification of parameter indices. Need a non-empty iterable, got "
        + str(indices)
    )

    chain_groups = r_group(
        [_np.mean(chain_values.T[indices], axis=1) for chain_values in data],
        [_np.var(chain_values.T[indices], axis=1, ddof=1) for chain_values in data],
        n,
        critical_r,
        approx,
    )

    long_patches_means = []
    long_patches_covs = []
    for group in chain_groups:
        k_g = len(group)
        if K_g >= k_g:
            # distribute K_g patches over the k_g chains in the group
            parts = _part(K_g, k_g)
            for i, chain_index in enumerate(group):
                data_full_chain = data[chain_index]
                this_patch_lengths = _part(len(data_full_chain), parts[i])
                append_components(
                    long_patches_means, long_patches_covs, data_full_chain,
                    this_patch_lengths,
                )
        else:
            # form one long chain out of the group and partition it
            data_full_chain = _np.vstack([data[i] for i in group])
            this_patch_lengths = _part(len(data_full_chain), K_g)
            append_components(
                long_patches_means, long_patches_covs, data_full_chain,
                this_patch_lengths,
            )

    return long_patches_means, long_patches_covs


def make_r_gaussmix(data, K_g=15, critical_r=2.0, indices=None, approx=False):
    """Use ``data`` from multiple chains to form a Gaussian mixture via the
    "long patches" approach of [BC13]: group chains by R value
    (:func:`r_group`), split each group into ``K_g`` patches and give each
    patch's empirical mean/covariance to a Gaussian component.
    (Reference: ``r_value.py:202-248``.)"""
    return _mkgauss(*_make_r_patches(data, K_g, critical_r, indices, approx))


def make_r_tmix(data, K_g=15, critical_r=2.0, dof=5.0, indices=None, approx=False):
    """Like :func:`make_r_gaussmix` but with Student-t components of the
    given ``dof`` (> 2), with sigma rescaled by ``(dof-2)/dof`` so each
    component keeps the patch covariance.
    (Reference: ``r_value.py:251-305``.)"""
    assert dof > 2.0, "``dof`` must be larger than 2. (got %g)" % dof

    means, covs = _make_r_patches(data, K_g, critical_r, indices, approx)

    sigmas = _np.asarray(covs)
    sigmas *= (dof - 2.0) / dof  # cov = dof / (dof - 2) * sigma

    return _mkt(means, sigmas, [dof] * len(means))
