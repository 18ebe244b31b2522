"""Distributional tests for the compacted-rejection chi-square sampler."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats

from pypmc_tpu.ops.random import chi2_log, chisquare, student_t_scale


@pytest.mark.parametrize("df", [0.5, 2.0, 4.7, 8.0, 100.0])
def test_chisquare_kolmogorov_smirnov(df):
    n = 200_000
    draws = np.asarray(chisquare(jax.random.PRNGKey(hash(df) % 2**31), df, (n,)))
    assert np.isfinite(draws).all()
    assert (draws > 0).all()
    stat, pvalue = scipy.stats.kstest(draws, "chi2", args=(df,))
    assert pvalue > 1e-3, (df, stat, pvalue)


def test_chisquare_moments():
    n = 400_000
    for df in [3.0, 10.0]:
        draws = np.asarray(chisquare(jax.random.PRNGKey(0), df, (n,)))
        assert np.isclose(draws.mean(), df, rtol=0.02)
        assert np.isclose(draws.var(), 2 * df, rtol=0.05)


def test_per_element_df():
    n = 100_000
    df = np.where(np.arange(n) % 2 == 0, 3.0, 30.0)
    draws = np.asarray(chisquare(jax.random.PRNGKey(1), jnp.asarray(df), (n,)))
    assert np.isclose(draws[::2].mean(), 3.0, rtol=0.05)
    assert np.isclose(draws[1::2].mean(), 30.0, rtol=0.05)


def test_tiny_df_log_space_stable():
    # dof ~ 1e-5 (the PMC dof solver's mindof): linear-scale chi2 underflows,
    # the log-scale path must stay finite
    n = 10_000
    logs = np.asarray(chi2_log(jax.random.PRNGKey(2), 1e-5, (n,)))
    assert np.isfinite(logs).all()
    # median of log(chi2) for tiny dof is enormous and negative
    assert np.median(logs) < -1000


def test_student_t_scale_distribution():
    # x = z * sqrt(dof/chi2) must be t-distributed
    n = 300_000
    dof = 6.0
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    scale = np.asarray(student_t_scale(k1, dof, (n,)))
    z = np.asarray(jax.random.normal(k2, (n,)))
    t = z * scale
    stat, pvalue = scipy.stats.kstest(t, "t", args=(dof,))
    assert pvalue > 1e-3, (stat, pvalue)


def test_deterministic_per_key():
    a = np.asarray(chisquare(jax.random.PRNGKey(5), 8.0, (1000,)))
    b = np.asarray(chisquare(jax.random.PRNGKey(5), 8.0, (1000,)))
    c = np.asarray(chisquare(jax.random.PRNGKey(6), 8.0, (1000,)))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
