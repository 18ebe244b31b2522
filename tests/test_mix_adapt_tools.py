"""Tests for hierarchical reduction, Gelman-Rubin grouping, partition and
patch_data."""

import numpy as np
import pytest

from pypmc_tpu.density import create_gaussian_mixture, partition, patch_data
from pypmc_tpu.mix_adapt.hierarchical import Hierarchical, kullback_leibler
from pypmc_tpu.mix_adapt.r_value import make_r_gaussmix, make_r_tmix, r_group, r_value


class TestKL:
    def test_kl_identical_zero(self):
        mix = create_gaussian_mixture([np.zeros(2)], [np.eye(2)])
        c = mix.components[0]
        assert np.isclose(kullback_leibler(c, c), 0.0)

    def test_kl_closed_form_1d(self):
        # KL(N(m1,s1) || N(m2,s2)) = log(s2/s1)/2... (variances v1, v2)
        v1, v2, m1, m2 = 0.5, 2.0, 1.0, -1.0
        mix = create_gaussian_mixture(
            [np.array([m1]), np.array([m2])], [np.array([[v1]]), np.array([[v2]])]
        )
        c1, c2 = mix.components
        expected = 0.5 * (np.log(v2 / v1) + v1 / v2 + (m1 - m2) ** 2 / v2 - 1)
        assert np.isclose(kullback_leibler(c1, c2), expected)


class TestHierarchical:
    def make_input(self):
        rng = np.random.default_rng(0)
        means = np.vstack(
            [rng.normal([0, 0], 0.2, size=(8, 2)), rng.normal([6, 6], 0.2, size=(12, 2))]
        )
        covs = np.array([np.eye(2) * 0.4] * 20)
        weights = np.ones(20)
        return create_gaussian_mixture(means, covs, weights)

    def test_reduces_to_two_modes(self):
        mix_in = self.make_input()
        guess = create_gaussian_mixture(
            [np.array([1.0, 1.0]), np.array([5.0, 5.0]), np.array([3.0, 3.0])],
            [np.eye(2)] * 3,
        )
        h = Hierarchical(mix_in, guess)
        steps = h.run()
        assert steps is not None
        assert len(h.g) == 2
        means = sorted([c.mu[0] for c in h.g.components])
        assert np.isclose(means[0], 0.0, atol=0.3)
        assert np.isclose(means[1], 6.0, atol=0.3)
        # moment-matched weights: 8/20 and 12/20
        assert np.allclose(sorted(h.g.weights), [0.4, 0.6], atol=1e-6)

    def test_rejects_fewer_inputs_than_outputs(self):
        mix_in = create_gaussian_mixture([np.zeros(2)], [np.eye(2)])
        guess = create_gaussian_mixture([np.zeros(2), np.ones(2)], [np.eye(2)] * 2)
        with pytest.raises(AssertionError):
            Hierarchical(mix_in, guess)


class TestRValue:
    def test_identical_chains_r_one(self):
        means = np.array([1.0, 1.0, 1.0])
        variances = np.array([0.5, 0.5, 0.5])
        # identical chains: B=0 -> R = (n-1)/n (approx) ~ 1
        assert np.isclose(r_value(means, variances, 1000, approx=True), 999 / 1000)

    def test_distinct_chains_large_r(self):
        means = np.array([0.0, 10.0, 20.0])
        variances = np.array([0.5, 0.5, 0.5])
        assert r_value(means, variances, 1000) > 10

    def test_r_group_separates(self):
        means = np.array([[0.0, 0.02], [0.01, 0.0], [10.0, 10.01], [10.02, 10.0]])
        variances = np.array([[0.1, 0.11], [0.11, 0.1], [0.1, 0.12], [0.12, 0.1]])
        groups = r_group(means, variances, 1000)
        assert groups == [[0, 1], [2, 3]]

    def test_make_r_gaussmix(self):
        rng = np.random.default_rng(5)
        chains = [rng.normal(0, 1, size=(600, 2)) for _ in range(3)] + [
            rng.normal(8, 1, size=(600, 2)) for _ in range(2)
        ]
        mix = make_r_gaussmix(chains, K_g=4)
        # two groups x 4 components each
        assert len(mix) == 8
        first_means = np.array([c.mu[0] for c in mix.components])
        assert np.sum(np.abs(first_means) < 2) == 4
        assert np.sum(np.abs(first_means - 8) < 2) == 4

    def test_make_r_tmix(self):
        rng = np.random.default_rng(6)
        chains = [rng.normal(0, 1, size=(500, 2)) for _ in range(3)]
        dof = 5.0
        mix = make_r_tmix(chains, K_g=3, dof=dof)
        assert len(mix) == 3
        for c in mix.components:
            assert c.dof == dof
        # sigma rescaled so that the component covariance matches the patch
        gmix = make_r_gaussmix(chains, K_g=3)
        for tc, gc in zip(mix.components, gmix.components):
            assert np.allclose(tc.sigma, gc.sigma * (dof - 2.0) / dof)


class TestPartition:
    def test_partition(self):
        assert partition(5, 2) == [3, 2]
        assert partition(6, 3) == [2, 2, 2]
        assert partition(7, 3) == [3, 2, 2]

    def test_patch_data(self):
        rng = np.random.default_rng(1)
        data = rng.normal(0, 1, size=(1000, 2))
        mix = patch_data(data, L=100)
        assert len(mix) == 10
        assert np.allclose(mix.weights, 0.1)

    def test_patch_data_singular_fallback(self):
        # constant patch -> zero covariance -> diagonal fallback also fails
        # -> patch skipped
        data = np.vstack([np.zeros((100, 2)), np.random.default_rng(2).normal(size=(100, 2))])
        mix = patch_data(data, L=100)
        assert len(mix) == 1
