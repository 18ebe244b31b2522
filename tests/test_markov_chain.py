"""Tests for the Markov-chain samplers (scan kernel + adaptation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pypmc_tpu.density import LocalGauss, LocalStudentT
from pypmc_tpu.sampler.markov_chain import (
    AdaptiveMarkovChain,
    MarkovChain,
    sample_adaptive_chains,
)
from pypmc_tpu.tools.indicator import hyperrectangle


MU = np.array([1.0, 2.0])
SIGMA = np.array([[1.0, 0.8], [0.8, 1.2]])
INV_SIGMA = np.linalg.inv(SIGMA)


def log_target(x):
    diff = x - jnp.asarray(MU)
    return -0.5 * diff @ jnp.asarray(INV_SIGMA) @ diff


class TestMarkovChain:
    def test_invalid_start_raises(self):
        prop = LocalGauss(np.eye(2) * 0.1)
        with pytest.raises(ValueError):
            MarkovChain(log_target, prop, np.array([np.nan, 0.0]))

    def test_basic_sampling_moments(self):
        prop = LocalGauss(np.eye(2) * 2.0)
        mc = MarkovChain(log_target, prop, MU.copy(), rng=11)
        accepted = mc.run(60000)
        assert 0 < accepted < 60000
        samples = mc.samples[:][5000:]  # discard burn-in
        assert np.allclose(samples.mean(axis=0), MU, atol=0.15)
        assert np.allclose(np.cov(samples, rowvar=0), SIGMA, atol=0.25)

    def test_student_t_proposal(self):
        prop = LocalStudentT(np.eye(2) * 2.0, dof=5.0)
        mc = MarkovChain(log_target, prop, MU.copy(), rng=13)
        mc.run(40000)
        samples = mc.samples[:][5000:]
        assert np.allclose(samples.mean(axis=0), MU, atol=0.15)

    def test_run_zero(self):
        prop = LocalGauss(np.eye(2))
        mc = MarkovChain(log_target, prop, MU.copy(), rng=0)
        assert mc.run(0) == 0

    def test_indicator_restricts_support(self):
        lower = MU - 1.0
        upper = MU + 1.0
        ind = hyperrectangle(lower, upper)
        prop = LocalGauss(np.eye(2) * 0.5)
        mc = MarkovChain(log_target, prop, MU.copy(), indicator=ind, rng=2)
        mc.run(5000)
        samples = mc.samples[:]
        assert np.all(samples >= lower - 1e-12)
        assert np.all(samples <= upper + 1e-12)

    def test_save_target_values(self):
        prop = LocalGauss(np.eye(2))
        mc = MarkovChain(log_target, prop, MU.copy(), rng=4, save_target_values=True)
        mc.run(100)
        tv = mc.target_values[:][:, 0]
        samples = mc.samples[:]
        expected = [float(log_target(jnp.asarray(s))) for s in samples]
        assert np.allclose(tv, expected)

    def test_nan_target_raises(self):
        def bad_target(x):
            # NaN outside a tiny box
            return jnp.where(jnp.all(jnp.abs(x - jnp.asarray(MU)) < 1e-3),
                             0.0, jnp.nan)

        prop = LocalGauss(np.eye(2))
        mc = MarkovChain(bad_target, prop, MU.copy(), rng=1)
        with pytest.raises(ValueError):
            mc.run(100)
        # continue_on_NaN rejects instead
        mc2 = MarkovChain(bad_target, prop, MU.copy(), rng=1)
        mc2.run(100, continue_on_NaN=True)
        assert np.allclose(mc2.samples[:], MU, atol=1e-3)

    def test_chain_continuity(self):
        prop = LocalGauss(np.eye(2))
        mc = MarkovChain(log_target, prop, MU.copy(), rng=9)
        mc.run(50)
        last = mc.samples[-1][-1]
        assert np.allclose(last, mc.current_point)

    def test_host_fallback_generic_proposal(self):
        class NumpyLocalGauss(LocalGauss):
            pass

        prop = LocalGauss(np.eye(2))
        mc = MarkovChain(log_target, prop, MU.copy(), rng=np.random.RandomState(3))
        accepted = mc.run(3000)
        assert 0 < accepted < 3000
        samples = mc.samples[:]
        assert np.allclose(samples[500:].mean(axis=0), MU, atol=0.4)


class TestAdaptiveMarkovChain:
    def test_adapt_improves_acceptance(self):
        prop = LocalGauss(np.eye(2) * 20.0)  # far too wide
        mc = AdaptiveMarkovChain(log_target, prop, MU.copy(), rng=21)
        rates = []
        for _ in range(12):
            accepted = mc.run(1000)
            rates.append(accepted / 1000)
            mc.adapt()
        # acceptance rate forced into (or towards) [0.15, 0.35]
        assert 0.1 < rates[-1] < 0.5
        # adapted covariance approximates the scaled target covariance
        assert np.allclose(
            mc.unscaled_sigma / np.abs(mc.unscaled_sigma).max(),
            SIGMA / np.abs(SIGMA).max(),
            atol=0.35,
        )

    def test_set_adapt_params_validation(self):
        prop = LocalGauss(np.eye(2))
        mc = AdaptiveMarkovChain(log_target, prop, MU.copy(), rng=0)
        mc.set_adapt_params(damping=0.6, force_acceptance_max=0.4)
        assert mc.damping == 0.6
        assert mc.force_acceptance_max == 0.4
        with pytest.raises(TypeError):
            mc.set_adapt_params(0.5)
        with pytest.raises(TypeError):
            mc.set_adapt_params(bogus=1)

    def test_covar_scale_factor_default(self):
        prop = LocalGauss(np.eye(2))
        mc = AdaptiveMarkovChain(log_target, prop, MU.copy(), rng=0)
        assert np.isclose(mc.covar_scale_factor, 2.38**2 / 2)


class TestVmappedChains:
    def test_parallel_chains_moments(self):
        starts = np.array([MU + d for d in [[0, 0], [1, -1], [-1, 1], [0.5, 0.5]]])
        samples, rates = sample_adaptive_chains(
            log_target, starts, np.eye(2) * 2.0, n_steps=2000, n_adapt_cycles=8,
            key=jax.random.PRNGKey(0),
        )
        samples = np.asarray(samples)
        assert samples.shape == (4, 16000, 2)
        pooled = samples[:, 4000:, :].reshape(-1, 2)
        assert np.allclose(pooled.mean(axis=0), MU, atol=0.15)
        assert np.allclose(np.cov(pooled, rowvar=0), SIGMA, atol=0.3)
        # final acceptance in a sane band after adaptation
        assert np.all(np.asarray(rates)[:, -1] > 0.05)


class TestAdaptFallback:
    def test_degenerate_run_falls_back_to_shrink(self):
        """All-identical samples give a zero covariance estimate; the full
        and diagonal updates both fail and the proposal covariance is
        divided by covar_scale_multiplier (reference fallback chain,
        markov_chain.py:378-391)."""
        prop = LocalGauss(np.eye(2))
        mc = AdaptiveMarkovChain(log_target, prop, MU.copy(), rng=0)
        sigma_before = mc.proposal.sigma.copy()
        # forge a degenerate last run: every visited point identical
        run = mc.samples.append(100)
        run[:] = MU
        mc._last_accept_count = 0
        # make the damped estimate exactly singular
        mc.unscaled_sigma = np.zeros((2, 2))
        mc.damping = 0.0  # a_t = 1 -> new estimate = sample cov = 0
        mc.adapt()
        assert np.allclose(
            mc.proposal.sigma, sigma_before / mc.covar_scale_multiplier
        )

    def test_scale_factor_bounds(self):
        prop = LocalGauss(np.eye(2))
        mc = AdaptiveMarkovChain(
            log_target, prop, MU.copy(), rng=0,
            covar_scale_factor=1.0, covar_scale_factor_max=2.0,
            covar_scale_factor_min=0.5, covar_scale_multiplier=10.0,
        )
        mc._update_scale_factor(accept_rate=1.0)   # would overshoot max
        assert mc.covar_scale_factor == 10.0       # one multiply allowed
        mc._update_scale_factor(accept_rate=1.0)   # now above max: frozen
        assert mc.covar_scale_factor == 10.0
        mc.covar_scale_factor = 1.0
        mc._update_scale_factor(accept_rate=0.0)
        assert mc.covar_scale_factor == 0.1
        mc._update_scale_factor(accept_rate=0.0)   # below min: frozen
        assert mc.covar_scale_factor == 0.1


def test_pool_mixture_target_cpu_path():
    """``sample_adaptive_chains`` accepts a ``MixtureParams`` target; on CPU
    (no Pallas) it routes through the scan kernel via the mixture's logpdf
    and still recovers the target moments."""
    from pypmc_tpu.density import core

    rng = np.random.default_rng(5)
    params, valid = core.make_mixture(
        MU[None, :].astype(np.float32),
        SIGMA[None].astype(np.float32),
    )
    assert bool(np.asarray(valid).all())
    C = 48
    starts = (MU[None, :] + rng.normal(0, 0.5, size=(C, 2))).astype(np.float32)
    samples, rates = sample_adaptive_chains(
        params, starts, np.eye(2, dtype=np.float32) * 2.38**2 / 2,
        n_steps=400, n_adapt_cycles=3, key=jax.random.PRNGKey(4))
    assert samples.shape == (C, 1200, 2)
    assert rates.shape == (C, 3)
    kept = np.asarray(samples[:, 400:, :]).reshape(-1, 2)
    assert np.allclose(kept.mean(axis=0), MU, atol=0.15)
    assert np.allclose(np.cov(kept, rowvar=False), SIGMA, atol=0.3)
