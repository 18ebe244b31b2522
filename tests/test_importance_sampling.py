"""Tests for the importance sampler, estimators, combined weights, and
convergence diagnostics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pypmc_tpu.density import create_gaussian_mixture, create_t_mixture, Gauss, MixtureDensity
from pypmc_tpu.density import core
from pypmc_tpu.sampler.importance_sampling import (
    ImportanceSampler,
    calculate_covariance,
    calculate_expectation,
    calculate_mean,
    combine_weights,
)
from pypmc_tpu.tools import History, ess, perp
from pypmc_tpu.tools.indicator import hyperrectangle


# ------------------------------------------------------------------ #
# estimators                                                          #
# ------------------------------------------------------------------ #

SAMPLES = np.array([[1.0, 2.0], [3.0, -1.0], [0.0, 0.5], [2.0, 2.0]])
WEIGHTS = np.array([0.5, 1.5, 1.0, 2.0])


def test_calculate_mean():
    expected = np.average(SAMPLES, axis=0, weights=WEIGHTS)
    assert np.allclose(np.asarray(calculate_mean(SAMPLES, WEIGHTS)), expected)


def test_calculate_expectation():
    f = lambda x: jnp.sum(x**2)
    expected = np.sum(WEIGHTS * np.sum(SAMPLES**2, axis=1)) / WEIGHTS.sum()
    assert np.isclose(float(calculate_expectation(SAMPLES, WEIGHTS, f)), expected)


def test_calculate_covariance():
    # the reference's unbiased weighted covariance formula
    # (importance_sampling.py:62-83)
    sum_w2 = WEIGHTS.sum() ** 2
    sum_sq = (WEIGHTS**2).sum()
    mean = np.average(SAMPLES, axis=0, weights=WEIGHTS)
    diff = SAMPLES - mean
    cov = np.einsum("n,ni,nj->ij", WEIGHTS, diff, diff) / WEIGHTS.sum()
    expected = sum_w2 / (sum_w2 - sum_sq) * cov
    assert np.allclose(np.asarray(calculate_covariance(SAMPLES, WEIGHTS)), expected)


def test_perp_ess_known_values():
    # equal weights: perfect
    w = np.ones(100)
    assert np.isclose(float(perp(w)), 1.0)
    assert np.isclose(float(ess(w)), 1.0)
    # single nonzero weight: terrible
    w = np.zeros(100)
    w[0] = 1.0
    assert np.isclose(float(perp(w)), 0.01)
    assert np.isclose(float(ess(w)), 0.01)


def test_history():
    h = History(2, prealloc=4)
    a = h.append(1)
    a[:] = 1.0
    b = h.append(2)
    b[:] = 2.0
    assert np.allclose(h[0], [[1.0, 1.0]])
    assert np.allclose(h[1], [[2.0, 2.0], [2.0, 2.0]])
    assert np.allclose(h[-1], h[1])
    assert np.allclose(h[:], [[1, 1], [2, 2], [2, 2]])
    assert len(h) == 2
    # growth beyond prealloc
    c = h.append(10)
    c[:] = 3.0
    assert len(h[:]) == 13
    h.clear()
    assert len(h) == 0


# ------------------------------------------------------------------ #
# ImportanceSampler                                                   #
# ------------------------------------------------------------------ #

MU_T = np.array([4.3, 1.1])
SIGMA_T = np.array([[0.5, 0.15], [0.15, 0.6]])
INV_SIGMA_T = np.linalg.inv(SIGMA_T)


def unnormalized_log_target(x):
    diff = x - MU_T
    return -0.5 * diff @ jnp.asarray(INV_SIGMA_T) @ diff


class TestImportanceSampler:
    def make_proposal(self):
        return create_t_mixture(
            [np.array([4.0, 1.0]), np.array([5.0, 1.4])],
            [np.eye(2), np.eye(2) * 1.5],
            [10.0, 10.0],
        )

    def test_moment_and_evidence_recovery(self):
        sampler = ImportanceSampler(unnormalized_log_target, self.make_proposal(), rng=7)
        sampler.run(100000)
        samples = sampler.samples[:]
        weights = sampler.weights[:][:, 0]
        mean = np.asarray(calculate_mean(samples, weights))
        cov = np.asarray(calculate_covariance(samples, weights))
        assert np.allclose(mean, MU_T, atol=0.02)
        assert np.allclose(cov, SIGMA_T, atol=0.03)
        # evidence of the unnormalized gaussian: (2 pi)^{d/2} det(sigma)^{1/2}
        evidence = weights.mean()
        expected = (2 * np.pi) ** 1 * np.sqrt(np.linalg.det(SIGMA_T))
        assert np.isclose(evidence, expected, rtol=0.02)

    def test_run_returns_latent_with_trace_sort(self):
        sampler = ImportanceSampler(unnormalized_log_target, self.make_proposal(), rng=3)
        origin = sampler.run(5000, trace_sort=True)
        assert origin.shape == (5000,)
        assert set(np.unique(origin)) <= {0, 1}

    def test_save_target_values(self):
        sampler = ImportanceSampler(
            unnormalized_log_target, self.make_proposal(), rng=1, save_target_values=True
        )
        sampler.run(100)
        tv = sampler.target_values[:][:, 0]
        samples = sampler.samples[:]
        expected = [float(unnormalized_log_target(jnp.asarray(s))) for s in samples]
        assert np.allclose(tv, expected)

    def test_indicator_zeroes_weights(self):
        ind = hyperrectangle(np.array([-1e3, -1e3]), np.array([4.3, 1e3]))
        sampler = ImportanceSampler(
            unnormalized_log_target, self.make_proposal(), indicator=ind, rng=5
        )
        sampler.run(2000)
        samples = sampler.samples[:]
        weights = sampler.weights[:][:, 0]
        outside = samples[:, 0] > 4.3
        assert np.all(weights[outside] == 0.0)
        assert np.all(weights[~outside] > 0.0)

    def test_clear(self):
        sampler = ImportanceSampler(unnormalized_log_target, self.make_proposal(), rng=0)
        sampler.run(100)
        sampler.clear()
        assert len(sampler.samples) == 0
        assert len(sampler.weights) == 0

    def test_numpy_rng_host_path(self):
        sampler = ImportanceSampler(
            unnormalized_log_target,
            self.make_proposal(),
            rng=np.random.RandomState(11),
        )
        sampler.run(2000)
        weights = sampler.weights[:][:, 0]
        mean = np.asarray(calculate_mean(sampler.samples[:], weights))
        assert np.allclose(mean, MU_T, atol=0.2)


# ------------------------------------------------------------------ #
# combine_weights (deterministic mixture, [Cor+12])                   #
# ------------------------------------------------------------------ #

class TestCombineWeights:
    def setup_method(self):
        self.prop1 = create_gaussian_mixture([MU_T], [np.eye(2)])
        self.prop2 = create_gaussian_mixture([MU_T + 0.5], [np.eye(2) * 2.0])
        rng = np.random.RandomState(0)
        self.samples = [
            self.prop1.propose(500, rng),
            self.prop2.propose(800, rng),
        ]
        self.weights = []
        for s, p in zip(self.samples, [self.prop1, self.prop2]):
            log_p = np.array([float(unnormalized_log_target(jnp.asarray(x))) for x in s])
            log_q = np.asarray(p.multi_evaluate(s))
            self.weights.append(np.exp(log_p - log_q))

    def combined_numpy(self):
        """[Cor+12] eq. (3) from first principles, linear scale."""
        N = np.array([len(s) for s in self.samples], dtype=float)
        N_total = N.sum()
        out = []
        for t, (s, w, p) in enumerate(
            zip(self.samples, self.weights, [self.prop1, self.prop2])
        ):
            denom = sum(
                N[l] * np.exp(np.asarray(q.multi_evaluate(s)))
                for l, q in enumerate([self.prop1, self.prop2])
            ) / N_total
            numer = np.exp(np.asarray(p.multi_evaluate(s))) * w
            out.append(numer / denom)
        return out

    def test_log_path_matches_formula(self):
        hist = combine_weights(self.samples, self.weights, [self.prop1, self.prop2])
        expected = self.combined_numpy()
        assert np.allclose(hist[0][:, 0], expected[0], rtol=1e-10)
        assert np.allclose(hist[1][:, 0], expected[1], rtol=1e-10)

    def test_linear_path_with_nonpositive_weight(self):
        self.weights[0][0] = 0.0  # forces the linear-scale branch
        hist = combine_weights(self.samples, self.weights, [self.prop1, self.prop2])
        expected = self.combined_numpy()
        assert np.allclose(hist[0][:, 0], expected[0], rtol=1e-10)

    def test_preserves_integral_estimate(self):
        hist = combine_weights(self.samples, self.weights, [self.prop1, self.prop2])
        plain = np.concatenate(self.weights)
        combined = hist[:][:, 0]
        assert np.isclose(combined.mean(), plain.mean(), rtol=0.1)

    def test_mismatched_lengths_raise(self):
        with pytest.raises(AssertionError):
            combine_weights(self.samples, self.weights[:1], [self.prop1, self.prop2])


def test_combine_weights_zero_weights_stay_on_log_path():
    """float32-underflowed (exactly zero) stored weights must combine to a
    combined weight of exactly 0 via the log path -- NOT reroute to the
    linear path (which evaluates exp(log q) and produces 0/0 at high
    dimension).  Negative weights still take the linear path."""
    import numpy as np
    from pypmc_tpu.density import create_gaussian_mixture
    from pypmc_tpu.sampler import combine_weights

    rng = np.random.default_rng(0)
    prop1 = create_gaussian_mixture([np.zeros(2)], [np.eye(2)])
    prop2 = create_gaussian_mixture([np.ones(2)], [np.eye(2) * 2.0])
    s1 = rng.normal(0, 1, (50, 2))
    s2 = rng.normal(1, 1.4, (50, 2))
    w1 = np.abs(rng.normal(1, 0.1, 50))
    w2 = np.abs(rng.normal(1, 0.1, 50))
    w1[[3, 17]] = 0.0  # underflowed samples
    combined = combine_weights([s1, s2], [w1, w2], [prop1, prop2])[:][:, 0]
    assert np.isfinite(combined).all()
    assert combined[3] == 0.0 and combined[17] == 0.0
    assert (combined[np.asarray(w1 > 0).nonzero()[0]] > 0).all()


def test_device_resident_runs_and_zero_copy_combine():
    """run(to_host=False) keeps runs on device; gather() defers the host
    transfer; combine_weights consumes the device arrays directly and
    produces the identical result as the host path."""
    import numpy as np
    import jax
    from pypmc_tpu.density import create_gaussian_mixture
    from pypmc_tpu.sampler import ImportanceSampler, combine_weights

    target_mix = create_gaussian_mixture([np.zeros(2)], [np.eye(2)])
    target = target_mix.evaluate_fn()
    p1 = create_gaussian_mixture([np.zeros(2)], [np.eye(2) * 2.0])
    p2 = create_gaussian_mixture([np.ones(2)], [np.eye(2) * 1.5])

    s = ImportanceSampler(target, p1, rng=7)
    s.run(200, to_host=False)
    assert len(s.samples) == 0 and len(s.device_runs) == 1
    sT1, w1 = s.device_runs[0]
    assert isinstance(sT1, jax.Array) and sT1.shape == (2, 200)
    s.proposal = p2
    s.run(100, to_host=False)
    (sT1, w1), (sT2, w2) = s.device_runs

    # zero-copy combination straight from the device arrays
    dev = combine_weights([sT1.T, sT2.T], [w1, w2], [p1, p2])[:][:, 0]

    # flush to host; identical host-path combination
    assert s.gather() == 2
    assert s.samples[:].shape == (300, 2)
    host = combine_weights([s.samples[0], s.samples[1]],
                           [s.weights[0][:, 0], s.weights[1][:, 0]],
                           [p1, p2])[:][:, 0]
    np.testing.assert_allclose(dev, host, rtol=1e-6)

    # clear drops pending runs too
    s.run(50, to_host=False)
    s.clear()
    assert len(s.device_runs) == 0 and len(s.samples) == 0
