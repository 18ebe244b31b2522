"""Verify the fused Pallas kernels' math in interpreter mode on CPU
(the compiled path is exercised on real TPU by bench.py and the driver).

The kernels use the transposed particle layout ``xT (D, N)``."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pypmc_tpu.density import core
from pypmc_tpu.ops import pallas_kernels as pk
from pypmc_tpu.ops.lse import logsumexp


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pk, "INTERPRET", True)


K, D, N = 5, 3, 1000
RNG = np.random.default_rng(0)
MEANS = RNG.normal(0, 2, size=(K, D)).astype(np.float32)
_A = RNG.normal(0, 0.3, size=(K, D, D)).astype(np.float32)
COVS = (np.eye(D, dtype=np.float32)[None] + np.einsum("kij,klj->kil", _A, _A)).astype(np.float32)
WEIGHTS = np.array([0.3, 0.25, 0.25, 0.2, 0.0], dtype=np.float32)
DOFS = np.full((K,), 7.0, dtype=np.float32)
X = RNG.normal(0, 2, size=(N, D)).astype(np.float32)
XT = jnp.asarray(X.T.copy())


def make_params(student_t):
    p, valid = core.make_mixture(MEANS, COVS, WEIGHTS, DOFS if student_t else None)
    assert bool(np.asarray(valid).all())
    return p


@pytest.mark.parametrize("student_t", [False, True])
def test_fused_logq_matches_xla(student_t):
    params = make_params(student_t)
    a2, b2, log_norm, weights, dof, center = core._pallas_operands(params, "inv_chol")
    out = pk.fused_logq(XT, a2, b2, log_norm, weights, dof, center, dim=D)
    ref = logsumexp(core.component_logpdfs(params, jnp.asarray(X)), params.weights, axis=-1)
    assert out.shape == (N,)
    assert np.allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("student_t", [False, True])
def test_fused_rho_matches_formula(student_t):
    params = make_params(student_t)
    a2, b2, log_norm, weights, dof, center = core._pallas_operands(params, "inv_chol")
    rho, logq = pk.fused_rho(XT, a2, b2, log_norm, weights, dof, center, dim=D)
    ind = np.asarray(core.component_logpdfs(params, jnp.asarray(X)))
    lse = np.asarray(logsumexp(ind, params.weights, axis=-1))
    tiny = float(jnp.finfo(jnp.float32).tiny)
    expected = np.exp(ind) * np.asarray(params.weights)[None, :] / (np.exp(lse)[:, None] + tiny)
    expected = np.where(np.asarray(params.weights)[None, :] > 0, expected, 0.0)
    assert rho.shape == (K, N)
    assert np.allclose(np.asarray(rho), expected.T, rtol=1e-3, atol=1e-5)
    assert np.allclose(np.asarray(logq), lse, rtol=1e-4, atol=1e-4)
    # dead component has exactly zero responsibility
    assert np.all(np.asarray(rho)[4, :] == 0.0)


def test_fused_maha_matches_xla():
    params = make_params(False)
    a2, b2, _, _, _, center = core._pallas_operands(params, "inv_chol")
    out = pk.fused_maha(XT, a2, b2, center, dim=D)
    ref = core.mahalanobis(jnp.asarray(X), params.means, params.inv_chol)
    assert out.shape == (K, N)
    assert np.allclose(np.asarray(out), np.asarray(ref).T, rtol=1e-4, atol=1e-4)


def test_fused_transform_matches_gather():
    params = make_params(False)
    z = RNG.normal(size=(N, D)).astype(np.float32)
    latent = RNG.integers(0, 4, size=N).astype(np.int32)
    scale = np.abs(RNG.normal(1, 0.1, size=N)).astype(np.float32)
    ct2 = params.chol.reshape(K * D, D)
    out = pk.fused_transform(jnp.asarray(z.T.copy()), jnp.asarray(latent),
                             jnp.asarray(scale), ct2, params.means.T, dim=D)
    chol = np.asarray(params.chol)
    expected = MEANS[latent] + np.einsum("nij,nj->ni", chol[latent], z) * scale[:, None]
    assert out.shape == (D, N)
    # split-precision matmul contract: error ~2^-16 relative to the
    # INTERMEDIATE magnitude |chol z| (can exceed output-relative 1e-5
    # under cancellation against mu)
    assert np.allclose(np.asarray(out), expected.T, rtol=1e-4, atol=5e-4)


def test_padding_non_multiple_tile():
    """N that is not a multiple of the tile size is padded internally."""
    params = make_params(False)
    a2, b2, log_norm, weights, dof, center = core._pallas_operands(params, "inv_chol")
    n = 777
    out = pk.fused_logq(XT[:, :n], a2, b2, log_norm, weights, dof, center, dim=D)
    ref = logsumexp(core.component_logpdfs(params, jnp.asarray(X[:n])), params.weights, axis=-1)
    assert out.shape == (n,)
    assert np.allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("kk,dd", [(7, 33), (2, 1), (40, 2)])
def test_odd_shapes_logq(kk, dd):
    """Ragged K/D (odd sublane and lane sizes) must pad correctly."""
    rng = np.random.default_rng(1)
    means = rng.normal(0, 2, size=(kk, dd)).astype(np.float32)
    a = rng.normal(0, 0.2, size=(kk, dd, dd)).astype(np.float32)
    covs = (np.eye(dd, dtype=np.float32)[None] + np.einsum("kij,klj->kil", a, a)).astype(np.float32)
    params, valid = core.make_mixture(means, covs)
    assert bool(np.asarray(valid).all())
    x = rng.normal(0, 2, size=(700, dd)).astype(np.float32)
    a2, b2, log_norm, weights, dof, center = core._pallas_operands(params, "inv_chol")
    out = pk.fused_logq(jnp.asarray(x.T.copy()), a2, b2, log_norm, weights, dof,
                        center, dim=dd)
    ref = logsumexp(core.component_logpdfs(params, jnp.asarray(x)), params.weights, axis=-1)
    assert np.allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_large_kd_fused_logq():
    """Evaluation kernels run at the 128-lane quantum, so mixtures with
    K*D far beyond 128 (here 24*24=576) stay on the fused path."""
    kk, dd = 24, 24
    rng = np.random.default_rng(2)
    means = rng.normal(0, 2, size=(kk, dd)).astype(np.float32)
    a = rng.normal(0, 0.1, size=(kk, dd, dd)).astype(np.float32)
    covs = (np.eye(dd, dtype=np.float32)[None]
            + np.einsum("kij,klj->kil", a, a)).astype(np.float32)
    params, valid = core.make_mixture(means, covs)
    assert bool(np.asarray(valid).all())
    assert pk.fits_vmem(kk, dd, pk.QUANTUM_EVAL)
    x = rng.normal(0, 2, size=(500, dd)).astype(np.float32)
    a2, b2, log_norm, weights, dof, center = core._pallas_operands(params, "inv_chol")
    out = pk.fused_logq(jnp.asarray(x.T.copy()), a2, b2, log_norm, weights,
                        dof, center, dim=dd)
    ref = logsumexp(core.component_logpdfs(params, jnp.asarray(x)),
                    params.weights, axis=-1)
    assert np.allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_fits_vmem_gating():
    """The quantum-aware VMEM gate: small mixtures fit everywhere, huge
    K*D only at the eval quantum, absurd K*D nowhere -- and use_pallas
    consults it (off-TPU it is False anyway, so check the pure function)."""
    assert pk.fits_vmem(10, 10, pk.QUANTUM_RNG)
    assert pk.fits_vmem(10, 10, pk.QUANTUM_EVAL)
    # K*D = 2560: fits a 128-lane tile, not a 1024-lane tile
    assert pk.fits_vmem(64, 40, pk.QUANTUM_EVAL)
    assert not pk.fits_vmem(64, 40, pk.QUANTUM_RNG)
    # far beyond any budget
    assert not pk.fits_vmem(1000, 100, pk.QUANTUM_EVAL)
    # pick_tile respects the quantum
    assert pk.pick_tile(64, 40, pk.QUANTUM_EVAL) % pk.QUANTUM_EVAL == 0
    assert pk.pick_tile(10, 10, pk.QUANTUM_RNG) % pk.QUANTUM_RNG == 0


@pytest.mark.parametrize("shift", [1e3, -4e3])
def test_fused_logq_translation_invariant(shift):
    """Evaluation accuracy must not degrade far from the origin: the kernels
    center on the mixture's weighted mean before the split-precision
    matmuls, so a rigid translation of mixture + data leaves the error
    unchanged (regression for the |U_k x|-scaling of the uncentered aug
    matmul)."""
    params = make_params(False)
    ref0 = np.asarray(logsumexp(core.component_logpdfs(params, jnp.asarray(X)),
                                params.weights, axis=-1))

    means_s = (MEANS + shift).astype(np.float32)
    x_s = (X + shift).astype(np.float32)
    params_s, valid = core.make_mixture(means_s, COVS, WEIGHTS)
    assert bool(np.asarray(valid).all())
    a2, b2, log_norm, weights, dof, center = core._pallas_operands(params_s, "inv_chol")
    out = pk.fused_logq(jnp.asarray(x_s.T.copy()), a2, b2, log_norm, weights,
                        dof, center, dim=D)
    # f32 representation of the shifted inputs themselves costs ~|shift|*eps
    # in the residual; the kernel must not add more than the near-origin
    # tolerance on top of an XLA HIGHEST reference of the same shifted data
    ref = logsumexp(core.component_logpdfs(params_s, jnp.asarray(x_s)),
                    params_s.weights, axis=-1)
    assert np.allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                       atol=2e-3 * max(1.0, abs(shift) / 1e3))
    # and stays close to the unshifted truth up to f32 input rounding
    assert np.allclose(np.asarray(ref), ref0, atol=0.2)


@pytest.mark.parametrize("student_t", [False, True])
def test_fused_pmc_stats_matches_xla_update(student_t, monkeypatch):
    """The single-pass fused sufficient-statistics kernel must reproduce the
    plain-XLA ``pmc_update`` bit-for-formula: weights, means, covariances,
    and (Student-t) the dof root all agree."""
    from pypmc_tpu.mix_adapt import pmc as pmc_mod

    n = 2048  # above the fused-path threshold
    rng = np.random.default_rng(7)
    x = rng.normal(0, 2, size=(n, D)).astype(np.float32)
    xT = jnp.asarray(x.T.copy())
    w = np.abs(rng.normal(1.0, 0.3, size=n)).astype(np.float32)
    params = make_params(student_t)

    ref = pmc_mod.pmc_update(params, xT, jnp.asarray(w), transposed=True,
                             dof_solver_steps=60)
    monkeypatch.setattr(core, "use_pallas", lambda arr, *a, **k: True)
    pmc_mod.pmc_update.clear_cache()
    try:
        out = pmc_mod.pmc_update(params, xT, jnp.asarray(w), transposed=True,
                                 dof_solver_steps=60)
    finally:
        pmc_mod.pmc_update.clear_cache()

    assert np.asarray(out.updated_ok).tolist() == np.asarray(ref.updated_ok).tolist()
    assert np.allclose(np.asarray(out.params.weights), np.asarray(ref.params.weights),
                       rtol=1e-4, atol=1e-6)
    assert np.allclose(np.asarray(out.params.means), np.asarray(ref.params.means),
                       rtol=1e-3, atol=1e-4)
    assert np.allclose(np.asarray(out.params.cov), np.asarray(ref.params.cov),
                       rtol=5e-3, atol=5e-4)
    if student_t:
        assert np.allclose(np.asarray(out.params.dof), np.asarray(ref.params.dof),
                           rtol=1e-3, atol=1e-3)
    # dead component stays dead
    assert float(np.asarray(out.params.weights)[4]) == 0.0


def test_fused_pmc_stats_sums():
    """Direct check of the raw statistics against a numpy model."""
    from pypmc_tpu.ops.pallas_kernels import fused_pmc_stats

    n = 1536
    rng = np.random.default_rng(11)
    x = rng.normal(0, 2, size=(n, D)).astype(np.float32)
    w = np.abs(rng.normal(1.0, 0.3, size=n)).astype(np.float32)
    params = make_params(True)
    a2, b2, log_norm, wk, dof_col, _ = core._pallas_operands(params, "inv_chol")
    psi_c = jax.scipy.special.digamma(0.5 * (D + params.dof)).reshape(K, 1)
    stats = fused_pmc_stats(jnp.asarray(x.T.copy()), jnp.asarray(w), a2, b2,
                            log_norm, wk, dof_col, psi_c.astype(jnp.float32),
                            dim=D, dof_stats=True)

    # numpy model of rho / gamma with the same formulas
    inv_chol = np.asarray(params.inv_chol)
    means = np.asarray(params.means)
    diff = np.einsum("kij,knj->kin", inv_chol, x[None] - means[:, None, :])
    maha = np.sum(diff * diff, axis=1)                       # (K, N)
    nu = np.asarray(params.dof)[:, None]
    ln = np.asarray(core.log_normalization(params))[:, None]
    ind = ln - 0.5 * (nu + D) * np.log1p(maha / nu)
    wk_np = np.asarray(params.weights)[:, None]
    m = ind.max(axis=0, keepdims=True)
    lse = m + np.log(np.sum(np.where(wk_np > 0, wk_np * np.exp(ind - m), 0.0),
                            axis=0, keepdims=True))
    rho = np.where(wk_np > 0, np.exp(ind) * wk_np / np.exp(lse), 0.0)
    wrho = rho * w[None, :]
    gamma = (nu + D) / (nu + maha)
    c = wrho * gamma

    assert np.allclose(np.asarray(stats["s0"]), wrho.sum(axis=1), rtol=1e-3)
    assert np.allclose(np.asarray(stats["s0c"]), c.sum(axis=1), rtol=1e-3)
    sd_np = np.einsum("kn,kin->ki", c, diff)
    assert np.allclose(np.asarray(stats["sd"]), sd_np, rtol=1e-3, atol=1e-3)
    g_np = np.einsum("kn,kin,kjn->kij", c, diff, diff)
    assert np.allclose(np.asarray(stats["g"]), g_np, rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(stats["sw"]), [w.sum(), (w * w).sum()], rtol=1e-4)
    brk1 = np.log(0.5 * (maha + nu)) - np.asarray(psi_c) + gamma
    assert np.allclose(np.asarray(stats["t1"]), (wrho * brk1).sum(axis=1),
                       rtol=1e-3, atol=1e-3)


def test_fused_pmc_stats_matmul_gather_equivalent(monkeypatch):
    """The selector-matmul statistics forms (``PYPMC_TPU_GATHER=matmul``)
    must stay equivalent to the streamed defaults (same inputs, jit caches
    cleared between modes -- the flag is read at trace time)."""
    from pypmc_tpu.ops.pallas_kernels import fused_pmc_stats

    n = 1536
    rng = np.random.default_rng(11)
    x = rng.normal(0, 2, size=(n, D)).astype(np.float32)
    w = np.abs(rng.normal(1.0, 0.3, size=n)).astype(np.float32)
    params = make_params(True)
    a2, b2, log_norm, wk, dof_col, _ = core._pallas_operands(params, "inv_chol")
    psi_c = jax.scipy.special.digamma(0.5 * (D + params.dof)).reshape(K, 1)

    def run():
        jax.clear_caches()
        return {k: np.asarray(v) for k, v in fused_pmc_stats(
            jnp.asarray(x.T.copy()), jnp.asarray(w), a2, b2, log_norm, wk,
            dof_col, psi_c.astype(jnp.float32), dim=D,
            dof_stats=True).items()}

    monkeypatch.setenv("PYPMC_TPU_GATHER", "matmul")
    s_m = run()
    monkeypatch.delenv("PYPMC_TPU_GATHER")
    s_s = run()
    for key in s_s:
        np.testing.assert_allclose(s_m[key], s_s[key], rtol=2e-4, atol=2e-4,
                                   err_msg=key)


def test_fused_vb_estep_matches_plain():
    """Fused VB E-step statistics and the in-kernel log_q_Z reduction must
    match the plain XLA E-step (and the bound computed from either)."""
    from pypmc_tpu.mix_adapt import variational as vb

    n, kk = 1536, 4
    rng = np.random.default_rng(3)
    x = rng.normal(0, 2, size=(n, D)).astype(np.float32)
    w = np.abs(rng.normal(1.0, 0.3, size=n)).astype(np.float32)
    w = w * (n / w.sum())
    alpha = jnp.asarray(np.abs(rng.normal(2, 0.5, kk)).astype(np.float32))
    beta = jnp.asarray(np.abs(rng.normal(3, 0.5, kk)).astype(np.float32))
    nu = jnp.asarray((D + np.abs(rng.normal(3, 1, kk))).astype(np.float32))
    m = jnp.asarray(rng.normal(0, 2, size=(kk, D)).astype(np.float32))
    a = rng.normal(0, 0.2, size=(kk, D, D)).astype(np.float32)
    W = jnp.asarray((np.eye(D)[None] * 0.5
                     + np.einsum("kij,klj->kil", a, a)).astype(np.float32))
    log_det_W = jnp.asarray(np.linalg.slogdet(np.asarray(W))[1].astype(np.float32))

    plain = vb._vb_e_step(jnp.asarray(x), jnp.asarray(w), alpha, beta, nu,
                          m, W, log_det_W)
    fused = vb._vb_e_step_fused(jnp.asarray(x.T.copy()), jnp.asarray(w),
                                alpha, beta, nu, m, W, log_det_W)

    assert np.allclose(np.asarray(fused.N_comp), np.asarray(plain.N_comp),
                       rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(fused.x_mean_comp), np.asarray(plain.x_mean_comp),
                       rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(fused.S), np.asarray(plain.S),
                       rtol=5e-3, atol=1e-3)
    # in-kernel entropy reduction vs the explicit (N, K) einsum
    ref_qz = float(jnp.einsum("n,nk,nk", jnp.asarray(w), plain.r, plain.log_rho))
    assert np.isclose(float(fused.log_q_Z), ref_qz, rtol=1e-3)

    # bound from either representation agrees
    hyper = dict(alpha0=alpha * 0 + 1e-5, beta0=alpha * 0 + 1e-5,
                 nu0=alpha * 0 + D + 1.0, m0=m * 0,
                 inv_W0=jnp.tile(jnp.eye(D, dtype=jnp.float32), (kk, 1, 1)),
                 log_det_W0=alpha * 0)
    args = (alpha, beta, nu, m, W, log_det_W, hyper["alpha0"], hyper["beta0"],
            hyper["nu0"], hyper["m0"], hyper["inv_W0"], hyper["log_det_W0"])
    b_plain = float(vb._vb_bound(jnp.asarray(w), plain, *args))
    b_fused = float(vb._vb_bound(jnp.asarray(w), fused, *args))
    assert np.isclose(b_fused, b_plain, rtol=1e-4)


def test_gaussian_inference_fused_path(monkeypatch):
    """GaussianInference with the fused E-step forced: run() converges to
    the same posterior as the plain path, and accessing ``.r`` lazily
    materializes the (N, K) responsibilities."""
    from pypmc_tpu.mix_adapt import variational as vb

    n = 1500
    rng = np.random.default_rng(5)
    x = np.vstack([rng.normal(-2, 0.5, size=(n // 2, D)),
                   rng.normal(2, 0.5, size=(n // 2, D))]).astype(np.float32)

    plain = vb.GaussianInference(x, components=3, nu=np.full(3, D + 1.0))
    plain.run(40, prune=0.0)

    monkeypatch.setattr(core, "use_pallas", lambda arr, *a, **k: True)
    fused = vb.GaussianInference(x, components=3, nu=np.full(3, D + 1.0))
    assert fused._fused_eligible()
    assert fused._e.r is None  # reduced representation
    fused.run(40, prune=0.0)

    assert np.allclose(np.asarray(fused.N_comp), np.asarray(plain.N_comp),
                       rtol=5e-3, atol=5e-2)
    assert np.allclose(np.asarray(fused.m), np.asarray(plain.m),
                       rtol=5e-3, atol=5e-3)
    # lazy materialization of the full responsibility matrix
    r = fused.r
    assert r.shape == (n, 3)
    assert np.allclose(np.asarray(jnp.sum(r, axis=1)), 1.0, atol=1e-5)
