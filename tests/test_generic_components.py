"""Duck-typed component support: the reference's test strategy builds
mixtures from minimal stand-in densities (DummyComponent pattern,
``density/mixture_test.py:15-23``); the generic host path must keep working
for those."""

import numpy as np
import pytest

from pypmc_tpu.density import MixtureDensity
from pypmc_tpu.sampler.importance_sampling import ImportanceSampler


class DummyComponent:
    """Minimal ProbabilityDensity duck type: constant log-density, fixed
    proposal point."""

    def __init__(self, eval_to=0.0, propose_point=(0.0,)):
        self.to_propose = np.array(propose_point, dtype=float)
        self.eval_to = float(eval_to)
        self.dim = len(self.to_propose)

    def evaluate(self, x):
        return self.eval_to

    def multi_evaluate(self, x, out=None):
        res = np.full(len(x), self.eval_to)
        if out is None:
            return res
        out[:] = res
        return out

    def propose(self, N):
        return np.vstack([self.to_propose] * N)


class TestGenericMixture:
    def make(self):
        comps = [DummyComponent(eval_to=-1.0, propose_point=[1.0, 1.0]),
                 DummyComponent(eval_to=-2.0, propose_point=[-1.0, 2.0])]
        return MixtureDensity(comps, [0.25, 0.75])

    def test_kind_generic(self):
        assert self.make().kind == "generic"

    def test_evaluate(self):
        mix = self.make()
        expected = np.log(0.25 * np.exp(-1.0) + 0.75 * np.exp(-2.0))
        assert np.isclose(mix.evaluate(np.zeros(2)), expected)

    def test_multi_evaluate_host_path(self):
        mix = self.make()
        x = np.zeros((5, 2))
        out = mix.multi_evaluate(x)
        expected = np.log(0.25 * np.exp(-1.0) + 0.75 * np.exp(-2.0))
        assert np.allclose(out, expected)
        individual = np.empty((5, 2))
        mix.multi_evaluate(x, individual=individual)
        assert np.allclose(individual[:, 0], -1.0)
        assert np.allclose(individual[:, 1], -2.0)

    def test_propose_fixed_points_and_trace(self):
        mix = self.make()
        rng = np.random.RandomState(0)
        samples, origin = mix.propose(1000, rng, trace=True, shuffle=False)
        counts = np.bincount(origin, minlength=2)
        assert np.isclose(counts[0] / 1000, 0.25, atol=0.05)
        assert np.all(samples[origin == 0] == np.array([1.0, 1.0]))
        assert np.all(samples[origin == 1] == np.array([-1.0, 2.0]))

    def test_propose_with_jax_seed_falls_back(self):
        mix = self.make()
        samples = mix.propose(100, rng=0)  # int seed, generic comps -> host
        assert samples.shape == (100, 2)

    def test_importance_sampler_generic_proposal(self):
        mix = self.make()

        def log_target(x):
            return -0.5 * float(np.dot(x, x))

        sampler = ImportanceSampler(log_target, mix, rng=np.random.RandomState(1))
        sampler.run(100)
        w = sampler.weights[:][:, 0]
        # hand-computable: q(x) is the same constant for every sample
        q = 0.25 * np.exp(-1.0) + 0.75 * np.exp(-2.0)
        samples = sampler.samples[:]
        expected = np.exp([-0.5 * np.dot(s, s) for s in samples]) / q
        assert np.allclose(w, expected, rtol=1e-10)
