"""In-kernel-RNG Pallas kernels under the interpreter.

The production propose/MCMC kernels draw ALL their randomness inside the
kernel from the TPU hardware PRNG.  The interpreter has no hardware PRNG,
so these kernels run there with the software counter generator
(``ops.pallas_kernels._seed_rng`` / ``_sw_random_bits``) -- the SAME kernel
bodies, different bit source.  These tests pin down:

* the software generator's distributional quality (the same checks the
  on-TPU harness applies to the hardware path),
* the *deterministic* halves of the kernels -- evaluation, sufficient
  statistics, Metropolis accept bookkeeping -- against the XLA reference
  path on the very samples the kernel drew (exact, not statistical),
* ``fused_mcmc_pool`` semantics: padding, carried VMEM state across step
  chunks, Student-t proposal scale, NaN policy, determinism.

The reference gets the equivalent assurance by re-running its whole suite
under ``mpirun`` (``/root/reference/Makefile:101-104``); here every kernel
family executes in CI.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pypmc_tpu.density.core as core
import pypmc_tpu.ops.pallas_kernels as pk


@pytest.fixture(autouse=True)
def interpret_and_pallas(monkeypatch):
    monkeypatch.setattr(pk, "INTERPRET", True)
    monkeypatch.setattr(core, "use_pallas", lambda *a, **k: True)
    yield


@pytest.fixture()
def xla_reference(monkeypatch):
    """Context manager-ish fixture: call the returned function to get a
    plain-XLA (non-Pallas) evaluation closure for reference values."""
    def make(fn, *args, **kwargs):
        orig_interpret = pk.INTERPRET
        orig_use = core.use_pallas
        try:
            # kernels stay in interpret mode (they must not compile for
            # TPU on the CPU backend); only the dispatch gate is lowered
            core.use_pallas = lambda *a, **k: False
            return fn(*args, **kwargs)
        finally:
            core.use_pallas = orig_use
            pk.INTERPRET = orig_interpret
    return make


def make_t_mixture(K=3, D=4, seed=1, student_t=True, dead=False):
    rng = np.random.default_rng(seed)
    means = rng.normal(0, 2, (K, D)).astype(np.float32)
    a = rng.normal(0, 0.2, (K, D, D)).astype(np.float32)
    covs = np.eye(D, dtype=np.float32)[None] + np.einsum("kij,klj->kil", a, a)
    w = rng.uniform(0.5, 1.5, K).astype(np.float32)
    if dead:
        w[1] = 0.0
    w /= w.sum()
    dofs = rng.uniform(5, 12, K).astype(np.float32) if student_t else None
    params, valid = core.make_mixture(means, covs, w, dofs)
    assert bool(np.asarray(valid).all())
    return params, means, covs, w, dofs


# ------------------------------------------------------------------ #
# software-generator quality                                          #
# ------------------------------------------------------------------ #

def test_sincos_2pi_accuracy():
    """The polynomial circle fold used by the Box-Muller halves must match
    float64 cos/sin(2*pi*u) to float32 resolution over the full quadrant
    structure (incl. the fold boundaries)."""
    u = np.concatenate([
        np.linspace(0, 1, 200001, endpoint=False),
        np.array([0.0, 0.25, 0.5, 0.75]) + 1e-7,
        np.array([0.25, 0.5, 0.75, 1.0]) - 1e-7,
    ]).astype(np.float32)
    c, s = pk._sincos_2pi(jnp.asarray(u))
    c, s = np.asarray(c), np.asarray(s)
    ref_c = np.cos(2 * np.pi * u.astype(np.float64))
    ref_s = np.sin(2 * np.pi * u.astype(np.float64))
    assert np.abs(c - ref_c).max() < 5e-7
    assert np.abs(s - ref_s).max() < 5e-7
    assert np.abs(c * c + s * s - 1.0).max() < 1e-6


def test_sw_normals_distribution():
    """fused_transform_rng with K=1, mu=0, chol=I emits raw Box-Muller
    normals from the software generator: check moments and a KS test."""
    from scipy import stats

    D, N = 4, 1 << 14
    ct2 = jnp.eye(D, dtype=jnp.float32)
    mu2 = jnp.zeros((D, 1), jnp.float32)
    lat = jnp.zeros((N,), jnp.int32)
    scale = jnp.ones((N,), jnp.float32)
    out = np.asarray(pk.fused_transform_rng(
        jnp.array([3, 8], jnp.int32), lat, scale, ct2, mu2, dim=D))
    flat = out.ravel()
    assert abs(flat.mean()) < 4 / np.sqrt(flat.size)
    assert abs(flat.std() - 1.0) < 0.01
    assert abs(stats.skew(flat)) < 0.05
    assert abs(stats.kurtosis(flat)) < 0.1
    # KS against the standard normal
    d, p = stats.kstest(flat[:: 7], "norm")
    assert p > 1e-3, (d, p)
    # rows (dimensions) are independent streams
    c = np.corrcoef(out)
    assert np.abs(c - np.eye(D)).max() < 0.05


def test_sw_uniform_latent_abundance():
    """The in-kernel inverse-CDF component draw of fused_propose_logq
    matches the mixture weights (binomial 4-sigma), and dead components
    are NEVER drawn."""
    params, means, covs, w, dofs = make_t_mixture(K=4, D=3, dead=True)
    N = 1 << 14
    out = core.propose_logq_T(params, jax.random.PRNGKey(5), N)
    lat = np.asarray(out[1])
    counts = np.bincount(lat, minlength=4)
    assert counts[1] == 0  # dead component
    w_np = np.asarray(params.weights)
    for k in (0, 2, 3):
        sd = np.sqrt(N * w_np[k] * (1 - w_np[k]))
        assert abs(counts[k] - N * w_np[k]) < 4 * sd


# ------------------------------------------------------------------ #
# fused_propose_logq                                                  #
# ------------------------------------------------------------------ #

def test_propose_logq_matches_xla_eval(xla_reference):
    """The kernel's log-q / log-p columns must equal an independent XLA
    evaluation of the very samples the kernel drew (the deterministic half
    of the kernel, checked exactly -- no statistics involved)."""
    params, *_ = make_t_mixture(K=3, D=4, student_t=True)
    tparams, *_ = make_t_mixture(K=2, D=4, seed=7, student_t=False)
    N = 4096
    xT, lat, logq, logp = core.propose_logq_T(
        params, jax.random.PRNGKey(42), N, tparams)
    logq_ref = xla_reference(core.mixture_logpdf_T, params, xT)
    logp_ref = xla_reference(core.mixture_logpdf_T, tparams, xT)
    np.testing.assert_allclose(np.asarray(logq), np.asarray(logq_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(logp_ref),
                               rtol=2e-3, atol=2e-3)


def test_propose_logq_matmul_gather_matches_streamed(monkeypatch):
    """The selector-matmul gather/block-sum forms (``PYPMC_TPU_GATHER=
    matmul``, kept for A/B measurement) must stay equivalent to the
    default streamed forms -- without a suite check the A/B baseline rots
    silently.  The flag is read at trace time, so the jit caches are
    cleared between the two modes; the interpret-mode software PRNG then
    draws the SAME samples in both, making the comparison exact up to the
    matmul forms' 2^-16 split precision."""
    params, *_ = make_t_mixture(K=5, D=3, student_t=True)
    tparams, *_ = make_t_mixture(K=2, D=3, seed=7, student_t=False)
    N = 4096

    def run():
        jax.clear_caches()
        return [np.asarray(o) for o in core.propose_logq_T(
            params, jax.random.PRNGKey(42), N, tparams)]

    monkeypatch.setenv("PYPMC_TPU_GATHER", "matmul")
    xT_m, lat_m, logq_m, logp_m = run()
    monkeypatch.delenv("PYPMC_TPU_GATHER")
    xT_s, lat_s, logq_s, logp_s = run()

    np.testing.assert_array_equal(lat_m, lat_s)
    np.testing.assert_allclose(xT_m, xT_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(logq_m, logq_s, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(logp_m, logp_s, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("K,D", [(1, 1), (1, 5), (2, 1), (7, 2), (3, 16)])
def test_propose_logq_shape_edges(K, D):
    """Edge shapes through the fused propose+eval kernel: single-component
    mixtures (the inverse-CDF latent sum reduces over ZERO rows), D=1,
    non-8-multiple D, and an odd N that exercises lane padding.  Each
    case pins log-q against the XLA evaluation of the drawn samples and
    the latent distribution against the mixture weights."""
    rng = np.random.default_rng(K * 100 + D)
    means = rng.normal(0, 2, (K, D))
    a = rng.normal(0, 0.2, (K, D, D))
    covs = np.eye(D)[None] * 1.2 + np.einsum("kij,klj->kil", a, a)
    w = None if K == 1 else rng.dirichlet(np.full(K, 5.0))
    params, valid = core.make_mixture(means, covs, w)
    assert bool(np.asarray(valid).all())
    N = 4097  # odd: exercises the lane-padding path
    out = core.propose_logq_T(params, jax.random.PRNGKey(5), N)
    xT, lat, logq = [np.asarray(o) for o in out]
    assert xT.shape == (D, N) and lat.shape == (N,) and logq.shape == (N,)
    assert np.isfinite(xT).all() and np.isfinite(logq).all()
    assert ((lat >= 0) & (lat < K)).all()
    logq_ref = np.asarray(core.mixture_logpdf_T(params, jnp.asarray(xT)))
    np.testing.assert_allclose(logq, logq_ref, rtol=2e-3, atol=2e-3)
    if K > 1:
        counts = np.bincount(lat, minlength=K) / N
        np.testing.assert_allclose(counts, np.asarray(params.weights),
                                   atol=4 * np.sqrt(0.25 / N) + 0.02)


def test_propose_logq_student_t_moments():
    """Per-component sample moments of the Student-t draw (exercises the
    in-kernel Marsaglia-Tsang chi-square in the 8-row layout)."""
    params, means, covs, w, dofs = make_t_mixture(K=3, D=4, student_t=True)
    N = 1 << 15
    xT, lat, _ = core.propose_logq_T(params, jax.random.PRNGKey(9), N)
    xT, lat = np.asarray(xT), np.asarray(lat)
    for k in range(3):
        sel = xT[:, lat == k]
        exp_cov = covs[k] * dofs[k] / (dofs[k] - 2)
        assert np.abs(sel.mean(axis=1) - means[k]).max() < 0.1
        rel = np.abs(np.cov(sel) - exp_cov).max() / np.abs(exp_cov).max()
        assert rel < 0.1, (k, rel)


def test_propose_logq_deterministic_per_seed():
    params, *_ = make_t_mixture(K=2, D=3, student_t=False)
    a = core.propose_logq_T(params, jax.random.PRNGKey(1), 2048)
    b = core.propose_logq_T(params, jax.random.PRNGKey(1), 2048)
    c = core.propose_logq_T(params, jax.random.PRNGKey(2), 2048)
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


# ------------------------------------------------------------------ #
# one-kernel IS+PMC step (fused_is_pmc_step propose half)             #
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("student_t", [False, True])
def test_one_kernel_pmc_step_self_consistent(student_t):
    """pmc_step_mixture_target (dense in-kernel-RNG path) must produce the
    SAME updated mixture as pmc_update(fused='off') recomputed on the
    samples/weights the kernel itself drew."""
    import pypmc_tpu.mix_adapt.pmc as pmc_mod

    params, *_ = make_t_mixture(K=3, D=4, student_t=student_t)
    tparams, *_ = make_t_mixture(K=2, D=4, seed=11, student_t=False)
    result, samples_T, w, latent, sw = pmc_mod.pmc_step_mixture_target(
        params, tparams, jax.random.PRNGKey(3), 4096, fused="dense")
    ref = pmc_mod.pmc_update(
        params, samples_T, w, transposed=True, fused="off",
        dof_solver_steps=100 if student_t else 0)
    np.testing.assert_allclose(np.asarray(result.params.means),
                               np.asarray(ref.params.means),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(result.params.cov),
                               np.asarray(ref.params.cov),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(result.params.weights),
                               np.asarray(ref.params.weights),
                               rtol=5e-3, atol=1e-4)
    if student_t:
        np.testing.assert_allclose(np.asarray(result.params.dof),
                                   np.asarray(ref.params.dof),
                                   rtol=5e-2, atol=5e-2)
    # weight diagnostics: sw = [sum w, sum w^2, sum w log w]
    w_np = np.asarray(w)
    np.testing.assert_allclose(np.asarray(sw)[0], w_np.sum(), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(sw)[1], (w_np ** 2).sum(), rtol=1e-3)


def test_one_kernel_pmc_step_blocked_self_consistent():
    """Same check through the K-blocked in-kernel-RNG kernel (K*D > 128)."""
    import pypmc_tpu.mix_adapt.pmc as pmc_mod

    params, *_ = make_t_mixture(K=40, D=4, student_t=False)
    tparams, *_ = make_t_mixture(K=2, D=4, seed=11, student_t=False)
    result, samples_T, w, latent, sw = pmc_mod.pmc_step_mixture_target(
        params, tparams, jax.random.PRNGKey(4), 4096, fused="blocked")
    ref = pmc_mod.pmc_update(params, samples_T, w, transposed=True,
                             fused="off", dof_solver_steps=0)
    np.testing.assert_allclose(np.asarray(result.params.means),
                               np.asarray(ref.params.means),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(result.params.weights),
                               np.asarray(ref.params.weights),
                               rtol=1e-2, atol=1e-3)


# ------------------------------------------------------------------ #
# fused_mcmc_pool                                                     #
# ------------------------------------------------------------------ #

def bimodal_target(D=2):
    tm = np.zeros((2, D), np.float32)
    tm[1] += 4.0
    tc = np.array([np.eye(D) * 0.5] * 2, np.float32)
    tparams, valid = core.make_mixture(tm, tc, np.array([0.5, 0.5], np.float32))
    assert bool(np.asarray(valid).all())
    return tparams, tm, tc


def run_pool(C=200, steps=64, D=2, dof=None, seed=(7, 9), chol_scale=0.8,
             nan_chain=None):
    tparams, tm, tc = bimodal_target(D)
    t_ops = core._pallas_operands(tparams, "inv_chol")
    rng = np.random.default_rng(3)
    starts = rng.normal(2, 1, (C, D)).astype(np.float32)
    x0T = jnp.asarray(starts.T)
    e0 = core.mixture_logpdf_T(tparams, x0T)
    chols = np.array([np.eye(D, dtype=np.float32) * chol_scale] * C)
    if nan_chain is not None:
        chols[nan_chain] = np.nan
    cholr = jnp.asarray(chols.transpose(1, 2, 0).reshape(D * D, C))
    out = pk.fused_mcmc_pool(
        jnp.array(seed, jnp.int32), x0T, e0, cholr,
        dof, t_ops, n_steps=steps, dim=D)
    return tuple(map(np.asarray, out)) + (tparams, starts)


def test_pool_carried_state_and_padding():
    """C deliberately NOT a multiple of the chain block: sliced outputs must
    be consistent -- final state == last emitted point, ef == logpdf(xf)."""
    points, acc, nan_c, xf, ef, tparams, starts = run_pool(C=200, steps=64)
    assert points.shape == (64, 2, 200)
    assert np.array_equal(points[-1], xf)
    ef_ref = np.asarray(core.mixture_logpdf_T(tparams, jnp.asarray(xf)))
    assert np.abs(ef - ef_ref).max() < 1e-3
    assert (acc > 0).all() and (acc < 64).all()
    assert (nan_c == 0).all()


def test_pool_deterministic_and_seed_dependent():
    a = run_pool(seed=(7, 9))[0]
    b = run_pool(seed=(7, 9))[0]
    c = run_pool(seed=(8, 9))[0]
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_pool_student_t_proposal():
    """Student-t proposal scale: wider steps -> lower acceptance than the
    Gaussian walk with the same Cholesky, still finite and moving."""
    pg = run_pool(steps=128, dof=None)
    pt = run_pool(steps=128, dof=3.0)
    assert np.isfinite(pt[0]).all()
    assert (pt[1] > 0).all()
    # heavier-tailed proposals accept less on average
    assert pt[1].mean() < pg[1].mean()


def test_pool_moments_match_scan_pool():
    """Distributional equivalence with the scan chain pool on the same
    bimodal target (pooled post-burn-in moments)."""
    from pypmc_tpu.sampler.markov_chain import sample_adaptive_chains

    tparams, tm, tc = bimodal_target(2)
    rng = np.random.default_rng(0)
    starts = np.concatenate([
        rng.normal(0, 0.5, (64, 2)), rng.normal(4, 0.5, (64, 2))
    ]).astype(np.float32)
    # fused path (MixtureParams target + use_pallas patched True)
    s_fused, r_fused = sample_adaptive_chains(
        tparams, starts, np.eye(2, dtype=np.float32) * 0.5, 96, 3,
        key=jax.random.PRNGKey(0))
    # scan path (plain callable target)
    tgt = lambda x: core.mixture_logpdf(tparams, x[None, :])[0]
    s_scan, r_scan = sample_adaptive_chains(
        tgt, starts, np.eye(2, dtype=np.float32) * 0.5, 96, 3,
        key=jax.random.PRNGKey(0))
    a = np.asarray(s_fused)[:, 96:].reshape(-1, 2)
    b = np.asarray(s_scan)[:, 96:].reshape(-1, 2)
    assert np.abs(a.mean(axis=0) - b.mean(axis=0)).max() < 0.25
    assert np.abs(a.std(axis=0) - b.std(axis=0)).max() < 0.25
    assert abs(np.asarray(r_fused).mean() - np.asarray(r_scan).mean()) < 0.1


def test_pool_nan_proposals_always_rejected():
    """A chain whose proposal Cholesky is NaN proposes NaN points: every
    proposal is counted in nan_counts and rejected; the chain never moves;
    other chains are unaffected."""
    points, acc, nan_c, xf, ef, tparams, starts = run_pool(
        C=130, steps=32, nan_chain=5)
    assert nan_c[5] == 32 and acc[5] == 0
    assert np.array_equal(xf[:, 5], starts[5])
    assert np.isfinite(points[:, :, np.arange(130) != 5]).all()
    assert (nan_c[np.arange(130) != 5] == 0).all()


def test_sample_adaptive_chains_nan_policy():
    """continue_on_NaN parity with MarkovChain.run: default raises, True
    keeps the pool running (scan path; a NaN-producing callable target)."""
    from pypmc_tpu.sampler.markov_chain import sample_adaptive_chains

    def target(x):
        # NaN outside a band around the origin
        r2 = jnp.sum(x * x)
        return jnp.where(r2 < 4.0, -0.5 * r2, jnp.nan)

    starts = np.zeros((8, 2), np.float32)
    with pytest.raises(ValueError, match="NaN"):
        sample_adaptive_chains(target, starts, np.eye(2, dtype=np.float32) * 4.0,
                               32, 1, key=jax.random.PRNGKey(0))
    s, r = sample_adaptive_chains(target, starts,
                                  np.eye(2, dtype=np.float32) * 4.0,
                                  32, 1, key=jax.random.PRNGKey(0),
                                  continue_on_NaN=True)
    assert np.isfinite(np.asarray(s)).all()


def test_sample_adaptive_chains_indicator():
    """An indicator restricts the support: no sample may land outside, and
    a MixtureParams target with an indicator routes through the scan pool
    (documented: the fused kernel evaluates pure mixture targets only)."""
    from pypmc_tpu.sampler.markov_chain import sample_adaptive_chains
    from pypmc_tpu.tools.indicator import hyperrectangle

    tparams, tm, tc = bimodal_target(2)
    ind = hyperrectangle(jnp.array([-10.0, -10.0]), jnp.array([2.0, 10.0]))
    starts = np.zeros((16, 2), np.float32)
    s, r = sample_adaptive_chains(
        tparams, starts, np.eye(2, dtype=np.float32) * 0.5, 64, 2,
        key=jax.random.PRNGKey(1), indicator=ind)
    s = np.asarray(s).reshape(-1, 2)
    assert (s[:, 0] <= 2.0).all()
    # invalid start (outside the support) -> loud error
    bad = np.full((4, 2), 5.0, np.float32)
    with pytest.raises(ValueError, match="not finite"):
        sample_adaptive_chains(tparams, bad, np.eye(2, dtype=np.float32),
                               8, 1, indicator=ind)


def test_pool_higher_dim_small_step_chunk():
    """At D=16 the step-chunk cap (compile-unit bound) drops sc below 8;
    the carried VMEM state must behave identically across the smaller
    chunks."""
    D, C, STEPS = 16, 130, 24
    tparams, _ = core.make_mixture(
        np.zeros((1, D), np.float32),
        np.array([np.eye(D, dtype=np.float32)]),
        np.array([1.0], np.float32))
    t_ops = core._pallas_operands(tparams, "inv_chol")
    rng = np.random.default_rng(0)
    starts = rng.normal(0, 1, (C, D)).astype(np.float32)
    x0T = jnp.asarray(starts.T)
    e0 = core.mixture_logpdf_T(tparams, x0T)
    chols = np.array([np.eye(D, dtype=np.float32) * (2.38 / np.sqrt(D))] * C)
    cholr = jnp.asarray(chols.transpose(1, 2, 0).reshape(D * D, C))
    points, acc, nan_c, xf, ef = map(np.asarray, pk.fused_mcmc_pool(
        jnp.array([3, 5], jnp.int32), x0T, e0, cholr, None, t_ops,
        n_steps=STEPS, dim=D))
    assert points.shape == (STEPS, D, C)
    assert np.array_equal(points[-1], xf)
    ef_ref = np.asarray(core.mixture_logpdf_T(tparams, jnp.asarray(xf)))
    assert np.abs(ef - ef_ref).max() < 1e-2
    assert (acc > 0).all() and (nan_c == 0).all()
