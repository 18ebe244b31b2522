"""Tests for the device-mesh parallel layer on the virtual 8-device CPU
mesh (conftest forces ``--xla_force_host_platform_device_count=8``).

The key invariance (SURVEY.md section 7 "hard parts"): the sharded PMC
update with psum'ed sufficient statistics must produce EXACTLY the same
mixture as the single-device update on the concatenated particle set."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from functools import partial
from jax.sharding import PartitionSpec as P

from pypmc_tpu.density import create_gaussian_mixture, create_t_mixture
from pypmc_tpu.density import core
from pypmc_tpu.mix_adapt.pmc import pmc_log_likelihood, pmc_update
from pypmc_tpu.parallel import (
    ParallelSampler,
    particle_mesh,
    pmc_run_sharded,
    run_is_step_sharded,
)

MEANS = np.array([[1.0, -1.0], [2.0, 3.0], [-3.0, 0.5]])
COVS = np.array(
    [
        [[1.3, 0.7], [0.7, 1.5]],
        [[0.5, 0.0], [0.0, 0.5]],
        [[2.0, -0.4], [-0.4, 1.0]],
    ]
)
WEIGHTS = np.array([0.5, 0.3, 0.2])
DOFS = np.array([5.0, 9.0, 30.0])

TARGET_MU = np.array([0.0, 1.0])
TARGET_INV = np.linalg.inv(np.array([[2.0, 0.3], [0.3, 1.0]]))


def log_target(x):
    diff = x - jnp.asarray(TARGET_MU)
    return -0.5 * diff @ jnp.asarray(TARGET_INV) @ diff


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestShardedInvariance:
    """Sharded psum update == single-device update on the same particles."""

    @pytest.mark.parametrize("student_t", [False, True])
    def test_pmc_update_sharded_equals_serial(self, student_t):
        mesh = particle_mesh()
        n = 8 * 50
        rng = np.random.default_rng(0)
        samples = rng.normal(size=(n, 2))
        weights = np.abs(rng.normal(1.0, 0.2, size=n))
        if student_t:
            params, _ = core.make_mixture(MEANS, COVS, WEIGHTS, DOFS)
        else:
            params, _ = core.make_mixture(MEANS, COVS, WEIGHTS)

        serial = pmc_update(params, jnp.asarray(samples), jnp.asarray(weights))

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P("particles"), P("particles")),
                 out_specs=P())
        def sharded(params, samples, weights):
            res = pmc_update(params, samples, weights, axis_name="particles")
            return res.params

        sharded_params = jax.jit(sharded)(
            params, jnp.asarray(samples), jnp.asarray(weights)
        )

        assert np.allclose(np.asarray(serial.params.weights),
                           np.asarray(sharded_params.weights), atol=1e-12)
        assert np.allclose(np.asarray(serial.params.means),
                           np.asarray(sharded_params.means), atol=1e-12)
        assert np.allclose(np.asarray(serial.params.cov),
                           np.asarray(sharded_params.cov), atol=1e-12)
        if student_t:
            assert np.allclose(np.asarray(serial.params.dof),
                               np.asarray(sharded_params.dof), atol=1e-9)

    def test_log_likelihood_sharded_equals_serial(self):
        mesh = particle_mesh()
        n = 8 * 25
        rng = np.random.default_rng(1)
        samples = rng.normal(size=(n, 2))
        params, _ = core.make_mixture(MEANS, COVS, WEIGHTS)
        serial = float(pmc_log_likelihood(params, jnp.asarray(samples)))

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P("particles")), out_specs=P())
        def sharded(params, samples):
            return pmc_log_likelihood(params, samples, axis_name="particles")

        assert np.isclose(float(jax.jit(sharded)(params, jnp.asarray(samples))),
                          serial, atol=1e-12)


class TestShardedSampling:
    def test_run_is_step_sharded_shapes_and_weights(self):
        mesh = particle_mesh()
        mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
        params = mix.stacked_params()
        samples_T, weights, latent = run_is_step_sharded(
            params, log_target, jax.random.PRNGKey(0), 8 * 100, mesh
        )
        assert samples_T.shape == (2, 800)  # transposed device layout
        assert weights.shape == (800,)
        # weights consistent with a recomputation on the host
        samples = np.asarray(samples_T).T
        log_q = np.asarray(core.mixture_logpdf(params, samples))
        log_p = np.asarray(jax.vmap(log_target)(jnp.asarray(samples)))
        assert np.allclose(np.asarray(weights), np.exp(log_p - log_q), rtol=1e-10)

    def test_devices_produce_distinct_samples(self):
        mesh = particle_mesh()
        mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
        samples_T, _, _ = run_is_step_sharded(
            mix.stacked_params(), log_target, jax.random.PRNGKey(0), 8 * 10, mesh
        )
        shards = np.split(np.asarray(samples_T).T, 8)
        for i in range(7):
            assert not np.allclose(shards[i], shards[i + 1])


class TestPMCRunSharded:
    @pytest.mark.parametrize("student_t", [False, True])
    def test_full_pmc_loop_adapts_to_target(self, student_t):
        mesh = particle_mesh()
        means0 = [np.array([-2.0, 0.0]), np.array([2.0, 2.0])]
        covs0 = [np.eye(2) * 4.0] * 2
        if student_t:
            params, _ = core.make_mixture(
                np.array(means0), np.array(covs0), None, np.array([10.0, 10.0])
            )
        else:
            params, _ = core.make_mixture(np.array(means0), np.array(covs0))
        params, stats = pmc_run_sharded(
            log_target, params, n_total=8 * 500, n_steps=8, mesh=mesh,
            key=jax.random.PRNGKey(1),
        )
        # perplexity improves as the proposal adapts to the unimodal target
        perp = np.asarray(stats.perplexity)
        assert perp[-1] > 0.8
        assert perp[-1] > perp[0]
        # the live components' means converge to the target mean
        w = np.asarray(params.weights)
        mu = np.asarray(params.means)
        est = (w[:, None] * mu).sum(axis=0)
        assert np.allclose(est, TARGET_MU, atol=0.3)

    def test_stats_fields(self):
        params, _ = core.make_mixture(MEANS, COVS, WEIGHTS)
        params, stats = pmc_run_sharded(
            log_target, params, n_total=8 * 100, n_steps=3,
            key=jax.random.PRNGKey(5),
        )
        assert stats.perplexity.shape == (3,)
        assert stats.ess.shape == (3,)
        assert np.all(np.asarray(stats.ess) > 0)
        assert np.all(np.isfinite(np.asarray(stats.log_likelihood)))


class TestParallelSampler:
    def test_run_and_history(self):
        mix = create_t_mixture(MEANS, COVS, DOFS, WEIGHTS)
        ps = ParallelSampler(log_target, mix, rng=3)
        assert ps.n_devices == 8
        ps.run(100)
        assert ps.samples[:].shape == (800, 2)
        assert len(ps.samples_list) == 8
        assert all(len(s) == 100 for s in ps.samples_list)
        ps.run(50)
        assert ps.samples[:].shape == (1200, 2)
        ps.clear()
        assert len(ps.samples) == 0

    def test_moment_recovery(self):
        prop = create_gaussian_mixture(
            [TARGET_MU], [np.eye(2) * 3.0]
        )
        ps = ParallelSampler(log_target, prop, rng=8)
        ps.run(20000)
        samples = ps.samples[:]
        w = ps.weights[:][:, 0]
        mean = (w[:, None] * samples).sum(axis=0) / w.sum()
        assert np.allclose(mean, TARGET_MU, atol=0.05)


class TestShardedVB:
    def test_vb_sharded_data_matches_unsharded(self):
        """With the data's particle axis sharded over the mesh, the jitted
        VB E/M steps auto-reduce the sufficient statistics across devices
        (GSPMD); the bound and posterior must match the unsharded run."""
        from jax.sharding import NamedSharding
        from pypmc_tpu.mix_adapt import GaussianInference
        from pypmc_tpu.parallel.mesh import particle_mesh, particle_sharding

        rng = np.random.default_rng(0)
        data = np.vstack([rng.normal(0, 1, (40, 2)), rng.normal(5, 1, (40, 2))])
        w = np.abs(rng.normal(1, 0.2, size=80))

        vb_plain = GaussianInference(data, components=4, weights=w)
        vb_plain.run(iterations=10, prune=0.0)

        mesh = particle_mesh()
        sharding = particle_sharding(mesh)
        data_s = jax.device_put(jnp.asarray(data), sharding)
        w_s = jax.device_put(jnp.asarray(w), sharding)
        vb_sharded = GaussianInference(data_s, components=4, weights=w_s)
        vb_sharded.run(iterations=10, prune=0.0)

        assert np.isclose(
            vb_plain.likelihood_bound(), vb_sharded.likelihood_bound(), rtol=1e-12
        )
        assert np.allclose(np.asarray(vb_plain.m), np.asarray(vb_sharded.m), atol=1e-12)
        assert np.allclose(np.asarray(vb_plain.N_comp), np.asarray(vb_sharded.N_comp),
                           atol=1e-10)


class TestScanSteps:
    def test_scan_steps_adapts_like_loop(self):
        params, _ = core.make_mixture(
            np.array([[-2.0, 0.0], [2.0, 2.0]]), np.array([np.eye(2) * 4.0] * 2)
        )
        p_scan, stats = pmc_run_sharded(
            log_target, params, n_total=8 * 400, n_steps=6,
            key=jax.random.PRNGKey(3), scan_steps=True,
        )
        assert stats.perplexity.shape == (6,)
        perp = np.asarray(stats.perplexity)
        assert np.all(np.isfinite(perp))
        assert perp[-1] > perp[0]
        w = np.asarray(p_scan.weights)
        mu = np.asarray(p_scan.means)
        est = (w[:, None] * mu).sum(axis=0)
        assert np.allclose(est, TARGET_MU, atol=0.3)
