"""Tests for the checkpoint/resume subsystem and batched-target adapters."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import pypmc_tpu as pt
from pypmc_tpu import checkpoint
from pypmc_tpu.density import create_gaussian_mixture, create_t_mixture
from pypmc_tpu.sampler import batched_target, evaluate_target, is_batched


MEANS = np.array([[1.0, -1.0], [2.0, 3.0]])
COVS = np.array([[[1.3, 0.7], [0.7, 1.5]], [[0.5, 0.0], [0.0, 0.5]]])
WEIGHTS = np.array([0.4, 0.6])

# save->load roundtrips require this process to actually write: in the
# 2-process suite checkpoint writes are process-0-gated (the fix for the
# concurrent same-path write race), so the roundtrips run single-process;
# the gating itself is covered by TestProcessGating on BOTH runtimes.
_writes_checkpoints = pytest.mark.single_process(
    reason="checkpoint writes are process-0-gated")


class TestProcessGating:
    def test_primary_process_writes(self, tmp_path):
        """``atomic_savez`` writes on the primary process and is a no-op on
        every other process of a multi-process runtime -- the same host-0
        gating as sub-ERROR logging (``tools/util.py``).  Under the
        2-process suite this asserts the file appears ONLY on process 0."""
        primary = checkpoint.is_primary_process()
        path = tmp_path / "gate.npz"
        checkpoint.atomic_savez(path, x=np.arange(3.0))
        assert path.exists() == primary
        if primary:
            with np.load(path) as f:
                assert np.array_equal(f["x"], np.arange(3.0))

    def test_no_tmp_leftover_on_failure(self, tmp_path):
        """A failing save must not leave a temp file behind (a stale
        ``*.tmp.*`` would silently accumulate in checkpoint directories)."""
        if not checkpoint.is_primary_process():
            pytest.skip("write path runs on the primary process only")

        class Boom:
            def __array__(self, dtype=None):
                raise RuntimeError("boom")

        with pytest.raises(Exception):
            checkpoint.atomic_savez(tmp_path / "x.npz", x=Boom())
        assert list(tmp_path.iterdir()) == []

    def test_concurrent_writers_never_corrupt(self, tmp_path):
        """Two INDEPENDENT processes hammering the same checkpoint path must
        never produce an unloadable archive: the temp name embeds the pid, so
        writers cannot interleave into one temp file (the round-4 race: a
        fixed ``path + '.tmp'`` let concurrent ``np.savez`` calls corrupt the
        archive before ``os.replace``)."""
        import subprocess
        import sys

        if not checkpoint.is_primary_process():
            pytest.skip("write path runs on the primary process only")
        target = tmp_path / "contended.npz"
        script = (
            "import sys, numpy as np\n"
            "sys.path.insert(0, %r)\n"
            "from pypmc_tpu import checkpoint\n"
            "val = float(sys.argv[2])\n"
            "for _ in range(40):\n"
            "    checkpoint.atomic_savez(sys.argv[1], x=np.full(2048, val))\n"
            % os.getcwd()
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", script, str(target), str(v)], env=env)
            for v in (1.0, 2.0)
        ]
        bad = 0
        import time
        deadline = time.time() + 120
        while any(p.poll() is None for p in procs) and time.time() < deadline:
            if target.exists():
                try:
                    with np.load(target) as f:
                        x = f["x"]
                        ok = (x.shape == (2048,) and x[0] in (1.0, 2.0)
                              and (x == x[0]).all())
                except Exception:
                    ok = False
                if not ok:
                    bad += 1
            time.sleep(0.001)
        for p in procs:
            p.wait(timeout=60)
            assert p.returncode == 0
        assert bad == 0, "%d corrupt/torn reads of the checkpoint" % bad
        assert not [p for p in tmp_path.iterdir() if ".tmp" in p.name]


@_writes_checkpoints
class TestMixtureCheckpoint:
    def test_gauss_roundtrip(self, tmp_path):
        mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
        path = tmp_path / "mix.npz"
        checkpoint.save_mixture(path, mix)
        loaded = checkpoint.load_mixture(path)
        assert np.allclose(loaded.weights, mix.weights)
        for a, b in zip(loaded.components, mix.components):
            assert np.allclose(a.mu, b.mu)
            assert np.allclose(a.sigma, b.sigma)

    def test_t_roundtrip(self, tmp_path):
        mix = create_t_mixture(MEANS, COVS, [4.0, 9.0], WEIGHTS)
        path = tmp_path / "mix.npz"
        checkpoint.save_mixture(path, mix)
        params = checkpoint.load_mixture_params(path)
        assert params.is_student_t
        assert np.allclose(np.asarray(params.dof), [4.0, 9.0])

    def test_params_roundtrip_preserves_evaluate(self, tmp_path):
        mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
        path = tmp_path / "mix.npz"
        checkpoint.save_mixture(path, mix.stacked_params())
        loaded = checkpoint.load_mixture(path)
        x = np.array([0.3, 0.6])
        assert np.isclose(loaded.evaluate(x), mix.evaluate(x))


@_writes_checkpoints
class TestVBCheckpoint:
    def test_vb_roundtrip_continues(self, tmp_path):
        rng = np.random.default_rng(0)
        data = np.vstack([rng.normal(0, 1, (40, 2)), rng.normal(5, 1, (30, 2))])
        vb = pt.mix_adapt.GaussianInference(data, components=4)
        vb.run(iterations=5, prune=0.0)
        bound = vb.likelihood_bound()
        path = tmp_path / "vb.npz"
        checkpoint.save_vb(path, vb)
        vb2 = checkpoint.load_vb(path, data)
        assert vb2.K == vb.K
        assert np.isclose(vb2.likelihood_bound(), bound, rtol=1e-10)
        # resumed run continues improving
        vb2.run(iterations=50, prune=0.0)
        assert vb2.likelihood_bound() >= bound - 1e-8


@_writes_checkpoints
class TestChainCheckpoint:
    def test_chain_roundtrip(self, tmp_path):
        inv = jnp.linalg.inv(jnp.asarray(COVS[0]))

        def target(x):
            d = x - jnp.asarray(MEANS[0])
            return -0.5 * d @ inv @ d

        prop = pt.density.LocalGauss(np.eye(2))
        mc = pt.sampler.AdaptiveMarkovChain(target, prop, MEANS[0].copy(), rng=0)
        mc.run(200)
        mc.adapt()
        path = tmp_path / "chain.npz"
        checkpoint.save_chain_state(path, mc)

        mc2 = pt.sampler.AdaptiveMarkovChain(target, prop, MEANS[0].copy(), rng=1)
        checkpoint.load_chain_state(path, mc2)
        assert np.allclose(mc2.current_point, mc.current_point)
        assert np.allclose(mc2.proposal.sigma, mc.proposal.sigma)
        assert mc2.adapt_count == mc.adapt_count
        mc2.run(100)  # usable after restore


class TestBatchedTarget:
    def test_marking_and_evaluation(self):
        @batched_target
        def t(x):
            return -jnp.sum(x**2, axis=-1)

        assert is_batched(t)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 2)))
        out = evaluate_target(t, x)
        assert np.allclose(np.asarray(out), -np.sum(np.asarray(x) ** 2, axis=1))

    def test_unbatched_vmapped(self):
        def t(x):
            return -jnp.sum(x**2)

        x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 2)))
        out = evaluate_target(t, x)
        assert np.allclose(np.asarray(out), -np.sum(np.asarray(x) ** 2, axis=1))

    def test_importance_sampler_with_batched_target(self):
        mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
        log_target = mix.evaluate_fn(batched=True)
        sampler = pt.sampler.ImportanceSampler(log_target, mix, rng=0)
        sampler.run(5000)
        w = sampler.weights[:][:, 0]
        # proposal == target => all weights are 1
        assert np.allclose(w, 1.0, atol=1e-4)

    def test_batched_target_with_indicator(self):
        mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
        log_target = mix.evaluate_fn(batched=True)
        ind = pt.tools.indicator.hyperrectangle(np.array([-100.0, -100.0]),
                                                np.array([1.0, 100.0]))
        sampler = pt.sampler.ImportanceSampler(log_target, mix, indicator=ind, rng=0)
        sampler.run(2000)
        samples = sampler.samples[:]
        w = sampler.weights[:][:, 0]
        assert np.all(w[samples[:, 0] > 1.0] == 0.0)
        assert np.all(w[samples[:, 0] <= 1.0] > 0.0)

    def test_markov_chain_accepts_batched_target(self):
        mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
        log_target = mix.evaluate_fn(batched=True)
        prop = pt.density.LocalGauss(np.eye(2))
        mc = pt.sampler.MarkovChain(log_target, prop, MEANS[0].copy(), rng=0)
        accepted = mc.run(500)
        assert 0 < accepted <= 500
