"""On-TPU validation harness: checks that cannot run under the CPU test
suite (the Pallas kernels compile only for TPU; pallas interpret mode lacks
the TPU PRNG primitives).

Run on a TPU host:  python benchmarks/tpu_validation.py

Covers:
1. fused kernels vs the XLA reference path (log-q, responsibilities,
   Mahalanobis) at float32 tolerances;
2. Pallas kernels INSIDE shard_map with psum'ed PMC statistics (single-chip
   mesh exercises the composition);
3. hardware-PRNG propose: per-component moments (Gauss + Student-t),
   determinism per key, distinct draws across keys;
4. chi-square sampler moments on TPU.

Prints one OK/FAIL line per check and exits nonzero on failure.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import PartitionSpec as P

    from pypmc_tpu.density import core
    from pypmc_tpu.mix_adapt.pmc import calculate_rho_rb, pmc_update
    from pypmc_tpu.ops.lse import logsumexp
    from pypmc_tpu.ops.random import chisquare
    from pypmc_tpu.parallel import particle_mesh

    assert jax.default_backend() == "tpu", "run this on a TPU host"

    failures = []

    def check(name, ok):
        print(("OK   " if ok else "FAIL ") + name, flush=True)
        if not ok:
            failures.append(name)

    K, D, N = 10, 10, 1 << 20
    rng = np.random.default_rng(0)
    means = rng.normal(0, 3, size=(K, D)).astype(np.float32)
    a = rng.normal(0, 0.2, size=(K, D, D)).astype(np.float32)
    covs = (np.eye(D, dtype=np.float32)[None] * 1.5
            + np.einsum("kij,klj->kil", a, a)).astype(np.float32)
    dofs = np.full((K,), 8.0, np.float32)
    w = np.full((K,), 1 / K, np.float32)
    w[3] = 0
    w = w / w.sum()
    params, _ = core.make_mixture(means, covs, w, dofs)
    x = jnp.asarray(rng.normal(0, 3, size=(100000, D)).astype(np.float32))

    # ---- 1. fused kernels vs XLA reference ---- #
    ind = core.component_logpdfs(params, x)
    ref_logq = np.asarray(logsumexp(ind, params.weights, axis=-1))
    pal_logq = np.asarray(core.mixture_logpdf(params, x))
    check("fused log-q matches XLA",
          np.allclose(ref_logq, pal_logq, rtol=1e-4, atol=1e-4))

    tiny = float(jnp.finfo(jnp.float32).tiny)
    rr = np.exp(np.asarray(ind)) * w[None, :] / (np.exp(ref_logq)[:, None] + tiny)
    rr = np.where(w[None, :] > 0, rr, 0)
    # split-precision Mahalanobis (2^-16 relative, see ops.pallas_kernels)
    # bounds the per-entry rho error at ~2e-4 worst case / ~1e-6 mean --
    # far below Monte-Carlo noise in any sufficient statistic
    pal_rho = np.asarray(calculate_rho_rb(params, x))
    check("fused responsibilities match formula",
          np.allclose(rr, pal_rho, rtol=2e-3, atol=3e-4))

    ref_m = np.asarray(core.mahalanobis(x, params.means, params.inv_chol))
    pal_m = np.asarray(core.mahalanobis_all(params, x))
    check("fused Mahalanobis matches XLA",
          np.allclose(ref_m, pal_m, rtol=1e-3, atol=1e-3))

    # ---- 1b. ragged D and large K*D at the 128-lane eval tile quantum ---- #
    for kk, dd in [(7, 33), (32, 24)]:
        mr = rng.normal(0, 2, size=(kk, dd)).astype(np.float32)
        ar = rng.normal(0, 0.1, size=(kk, dd, dd)).astype(np.float32)
        cr = (np.eye(dd, dtype=np.float32)[None]
              + np.einsum("kij,klj->kil", ar, ar)).astype(np.float32)
        pr, vr = core.make_mixture(mr, cr)
        assert bool(np.asarray(vr).all())
        xr = jnp.asarray(rng.normal(0, 2, size=(50000, dd)).astype(np.float32))
        pal = np.asarray(core.mixture_logpdf(pr, xr))
        indr = core.component_logpdfs(pr, xr)
        ref = np.asarray(logsumexp(indr, pr.weights, axis=-1))
        check("fused log-q ragged/large K*D (K=%d, D=%d)" % (kk, dd),
              np.allclose(pal, ref, rtol=1e-3, atol=2e-3))

    # ---- 2. Pallas inside shard_map + psum (1-chip mesh) ---- #
    mesh = particle_mesh(jax.devices()[:1])
    samples = jnp.asarray(rng.normal(size=(4096, D)).astype(np.float32))
    weights = jnp.asarray(np.abs(rng.normal(1, 0.2, size=4096)).astype(np.float32))

    serial = pmc_update(params, samples, weights)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("particles"), P("particles")), out_specs=P(),
             check_vma=False)
    def sharded(p, s, wts):
        return pmc_update(p, s, wts, axis_name="particles").params

    out = jax.jit(sharded)(params, samples, weights)
    check("pallas-inside-shard_map PMC update matches serial",
          np.allclose(np.asarray(serial.params.means), np.asarray(out.means),
                      rtol=1e-5, atol=1e-5))

    # ---- 2b. fused single-pass PMC statistics vs the XLA path ---- #
    # (the compiled fused_pmc_stats kernel on hardware against the plain
    # rho/einsum implementation; Student-t covers the gamma pass + dof root)
    gparams, _ = core.make_mixture(means, covs, w)
    for tname, p_in in [("gauss", gparams), ("student_t", params)]:
        fused = pmc_update(p_in, samples, weights)
        saved = core.use_pallas
        core.use_pallas = lambda arr, *a, **k: False
        pmc_update.clear_cache()
        try:
            plain = pmc_update(p_in, samples, weights)
        finally:
            core.use_pallas = saved
            pmc_update.clear_cache()
        ok = np.allclose(np.asarray(fused.params.weights),
                         np.asarray(plain.params.weights), rtol=1e-4, atol=1e-6)
        ok &= np.allclose(np.asarray(fused.params.means),
                          np.asarray(plain.params.means), rtol=1e-3, atol=1e-3)
        ok &= np.allclose(np.asarray(fused.params.cov),
                          np.asarray(plain.params.cov), rtol=1e-2, atol=1e-3)
        if p_in.is_student_t:
            ok &= np.allclose(np.asarray(fused.params.dof),
                              np.asarray(plain.params.dof), rtol=1e-3, atol=1e-3)
        check("fused PMC statistics match XLA path (%s)" % tname, bool(ok))

    # ---- 2c. fused VB E-step vs the plain XLA path ---- #
    from pypmc_tpu.mix_adapt import variational as vbmod

    n_vb = 100000
    xv = jnp.asarray(rng.normal(0, 3, size=(n_vb, D)).astype(np.float32))
    wv = jnp.asarray(np.abs(rng.normal(1, 0.2, size=n_vb)).astype(np.float32))
    wv = wv * (n_vb / float(jnp.sum(wv)))
    alpha_v = jnp.asarray(np.abs(rng.normal(2, 0.5, K)).astype(np.float32))
    beta_v = jnp.asarray(np.abs(rng.normal(3, 0.5, K)).astype(np.float32))
    nu_v = jnp.asarray((D + np.abs(rng.normal(3, 1, K))).astype(np.float32))
    m_v = jnp.asarray(means)
    a_v = rng.normal(0, 0.2, size=(K, D, D)).astype(np.float32)
    W_v = jnp.asarray((np.eye(D)[None] * 0.5
                       + np.einsum("kij,klj->kil", a_v, a_v)).astype(np.float32))
    ldW_v = jnp.asarray(np.linalg.slogdet(np.asarray(W_v))[1].astype(np.float32))
    plain_e = vbmod._vb_e_step(xv, wv, alpha_v, beta_v, nu_v, m_v, W_v, ldW_v)
    fused_e = vbmod._vb_e_step_fused(jnp.asarray(np.asarray(xv).T.copy()), wv,
                                     alpha_v, beta_v, nu_v, m_v, W_v, ldW_v)
    ref_qz = float(jnp.einsum("n,nk,nk", wv, plain_e.r, plain_e.log_rho))
    ok = np.allclose(np.asarray(fused_e.N_comp), np.asarray(plain_e.N_comp),
                     rtol=1e-3, atol=1e-2)
    ok &= np.allclose(np.asarray(fused_e.x_mean_comp),
                      np.asarray(plain_e.x_mean_comp), rtol=1e-3, atol=1e-3)
    ok &= np.allclose(np.asarray(fused_e.S), np.asarray(plain_e.S),
                      rtol=1e-2, atol=1e-3)
    ok &= np.isclose(float(fused_e.log_q_Z), ref_qz, rtol=1e-3)
    check("fused VB E-step matches XLA path", bool(ok))

    # ---- 2d. fused VB E-step under EXPLICIT shard_map (sharded stats) ---- #
    mesh_vb = particle_mesh()
    sharded_e = vbmod._vb_e_step_fused(
        jnp.asarray(np.asarray(xv).T.copy()), wv,
        alpha_v, beta_v, nu_v, m_v, W_v, ldW_v,
        mesh=mesh_vb, axis_name=mesh_vb.axis_names[0])
    ok = np.allclose(np.asarray(sharded_e.N_comp), np.asarray(fused_e.N_comp),
                     rtol=1e-5, atol=1e-4)
    ok &= np.allclose(np.asarray(sharded_e.S), np.asarray(fused_e.S),
                      rtol=1e-4, atol=1e-5)
    ok &= np.isclose(float(sharded_e.log_q_Z), float(fused_e.log_q_Z),
                     rtol=1e-5)
    check("fused VB E-step inside shard_map matches unsharded", bool(ok))

    # ---- 2e. K-BLOCKED kernels on hardware (K*D past the dense cap) ---- #
    # the mixture-reduction scale: K=400 at D=2 (patch_data-style), plus a
    # large-D case; fused-blocked adapted mixture vs the forced-XLA path
    for kk, dd, st in [(400, 2, True), (64, 40, False)]:
        # means scaled ~1/sqrt(D) so f32 responsibilities stay representable
        # at D=40 (a spread-out 40-D problem underflows EVERY f32 rho --
        # reference semantics there are "all components die", not a kernel
        # property); samples drawn FROM the mixture, the PMC conditioning
        mr = rng.normal(0, 3.0 / np.sqrt(dd), size=(kk, dd)).astype(np.float32)
        ar = rng.normal(0, 0.1, size=(kk, dd, dd)).astype(np.float32)
        cr = (np.eye(dd, dtype=np.float32)[None]
              + np.einsum("kij,klj->kil", ar, ar)).astype(np.float32)
        dofr = np.full((kk,), 8.0, np.float32) if st else None
        pr, vr = core.make_mixture(mr, cr, None, dofr)
        assert bool(np.asarray(vr).all())
        sr, _lat = core.propose(pr, jax.random.PRNGKey(13), 1 << 16)
        wr = jnp.asarray(np.abs(rng.normal(1, 0.2, size=1 << 16)).astype(np.float32))
        # force the K-blocked kernel (the auto policy routes this N=2^16
        # shape to the XLA path; the blocked kernel is what's under test)
        fused_b = pmc_update(pr, sr, wr, fused="blocked")
        saved = core.use_pallas
        core.use_pallas = lambda arr, *a, **k: False
        pmc_update.clear_cache()
        try:
            plain_b = pmc_update(pr, sr, wr)
        finally:
            core.use_pallas = saved
            pmc_update.clear_cache()
        ok = fused_b.rho is None  # proves the fused path ran
        ok &= np.allclose(np.asarray(fused_b.params.weights),
                          np.asarray(plain_b.params.weights),
                          rtol=1e-3, atol=1e-6)
        ok &= np.allclose(np.asarray(fused_b.params.means),
                          np.asarray(plain_b.params.means), rtol=1e-2, atol=1e-2)
        scale_b = np.abs(np.asarray(plain_b.params.cov)).max(axis=(1, 2))
        cov_err_b = (np.abs(np.asarray(fused_b.params.cov)
                            - np.asarray(plain_b.params.cov)).max(axis=(1, 2))
                     / scale_b)
        ok &= bool(cov_err_b.max() < 2e-2)
        check("K-blocked fused PMC stats match XLA (K=%d, D=%d)" % (kk, dd),
              bool(ok))

    # blocked VB E-step on hardware (K*D = 160 > 128)
    kk = 80
    m_b = jnp.asarray(rng.normal(0, 3, size=(kk, 2)).astype(np.float32))
    a_b = rng.normal(0, 0.2, size=(kk, 2, 2)).astype(np.float32)
    W_b = jnp.asarray((np.eye(2)[None] * 0.5
                       + np.einsum("kij,klj->kil", a_b, a_b)).astype(np.float32))
    ld_b = jnp.asarray(np.linalg.slogdet(np.asarray(W_b))[1].astype(np.float32))
    al_b = jnp.asarray(np.abs(rng.normal(2, 0.5, kk)).astype(np.float32))
    be_b = jnp.asarray(np.abs(rng.normal(3, 0.5, kk)).astype(np.float32))
    nu_b = jnp.asarray((2 + np.abs(rng.normal(3, 1, kk))).astype(np.float32))
    xb = jnp.asarray(rng.normal(0, 3, size=(1 << 16, 2)).astype(np.float32))
    wb = jnp.ones((1 << 16,), jnp.float32)
    plain_eb = vbmod._vb_e_step(xb, wb, al_b, be_b, nu_b, m_b, W_b, ld_b)
    fused_eb = vbmod._vb_e_step_fused(
        jnp.asarray(np.asarray(xb).T.copy()), wb,
        al_b, be_b, nu_b, m_b, W_b, ld_b, blocked=True)
    ok = np.allclose(np.asarray(fused_eb.N_comp), np.asarray(plain_eb.N_comp),
                     rtol=1e-2, atol=1e-2)
    ok &= np.allclose(np.asarray(fused_eb.x_mean_comp),
                      np.asarray(plain_eb.x_mean_comp), rtol=1e-2, atol=1e-2)
    ok &= np.allclose(np.asarray(fused_eb.S), np.asarray(plain_eb.S),
                      rtol=2e-2, atol=2e-2)
    check("K-blocked fused VB E-step matches XLA (K=80, D=2)", bool(ok))

    # ---- 3. hardware-PRNG propose moments ---- #
    for name, dd in [("gauss", None), ("student_t", dofs)]:
        p2, _ = core.make_mixture(means, covs, w, dd)
        sT, lat = core.propose_T(p2, jax.random.PRNGKey(0), N)
        s = np.asarray(sT).T
        lat = np.asarray(lat)
        ok = bool(np.isfinite(s).all())
        for k in range(K):
            if w[k] == 0:
                ok &= bool((lat != k).all())
                continue
            sel = s[lat == k]
            factor = 1.0 if dd is None else dofs[k] / (dofs[k] - 2)
            ok &= np.allclose(sel.mean(axis=0), means[k], atol=0.05)
            ok &= np.allclose(np.cov(sel, rowvar=0), factor * covs[k],
                              rtol=0.2, atol=0.3)
        sT2, _ = core.propose_T(p2, jax.random.PRNGKey(0), N)
        ok &= bool(np.array_equal(np.asarray(sT2), np.asarray(sT)))
        sT3, _ = core.propose_T(p2, jax.random.PRNGKey(1), N)
        ok &= not np.array_equal(np.asarray(sT3), np.asarray(sT))
        check("hardware-PRNG propose (%s): moments/determinism" % name, ok)

    # ---- 3b. fused propose+eval kernel ---- #
    for name, dd in [("gauss", None), ("student_t", dofs)]:
        p2, _ = core.make_mixture(means, covs, w, dd)
        t2, _ = core.make_mixture(means[:2], covs[:2])
        sT, lat, logq, logp = core.propose_logq_T(
            p2, jax.random.PRNGKey(5), N, t2)
        s = np.asarray(sT).T
        lat = np.asarray(lat)
        ok = bool(np.isfinite(s).all())
        for k in range(K):
            if w[k] == 0:
                ok &= bool((lat != k).all())
                continue
            sel = s[lat == k]
            factor = 1.0 if dd is None else dofs[k] / (dofs[k] - 2)
            ok &= np.allclose(sel.mean(axis=0), means[k], atol=0.05)
            ok &= np.allclose(np.cov(sel, rowvar=0), factor * covs[k],
                              rtol=0.2, atol=0.3)
        lq2 = np.asarray(core.mixture_logpdf_T(p2, jnp.asarray(np.asarray(sT))))
        lp2 = np.asarray(core.mixture_logpdf_T(t2, jnp.asarray(np.asarray(sT))))
        ok &= np.allclose(np.asarray(logq), lq2, rtol=1e-4, atol=2e-4)
        ok &= np.allclose(np.asarray(logp), lp2, rtol=1e-4, atol=2e-4)
        check("fused propose+eval (%s): moments + log-q/log-p" % name, ok)

    # ---- 3c. K=1 edge through the fused kernel ON HARDWARE ---- #
    # The interpreter accepts 0-row slices that Mosaic rejects ("vector
    # types must have positive constant sizes"); a K=1 final proposal is
    # routine (the PMC refinement often kills all but one component), so
    # the edge must compile on the real chip, not just under interpret.
    for name, dd1 in [("gauss", None), ("student_t", dofs[:1])]:
        p1, _ = core.make_mixture(means[:1], covs[:1], None, dd1)
        s1T, l1, q1, pp1 = core.propose_logq_T(
            p1, jax.random.PRNGKey(6), N, p1)
        ok = bool((np.asarray(l1) == 0).all())
        ok &= bool(np.isfinite(np.asarray(q1)).all())
        ok &= np.allclose(np.asarray(q1), np.asarray(pp1))
        check("fused propose+eval K=1 edge (%s, hardware compile)" % name,
              ok)

    # ---- 4. chi-square sampler moments on TPU ---- #
    draws = np.asarray(chisquare(jax.random.PRNGKey(2), 8.0, (N,)))
    # ---- 6. one-kernel IS+PMC training step (mixture target) ---- #
    # the fused_is_pmc_step kernel must produce the same adapted mixture as
    # pmc_update applied to its OWN (samples, weights) outputs, and its
    # in-kernel weight reductions must match direct sums
    from pypmc_tpu.mix_adapt.pmc import pmc_step_mixture_target

    t_means = np.stack([rng.normal(0, 1, D),
                        rng.normal(0, 1, D) + 3.0]).astype(np.float32)
    t_covs = np.array([np.eye(D) * 0.8] * 2).astype(np.float32)
    t_params, _ = core.make_mixture(t_means, t_covs,
                                    np.array([0.3, 0.7], np.float32))
    for tname, p_in in [("gauss", gparams), ("student_t", params)]:
        res, sT, wgt, lat, sw = pmc_step_mixture_target(
            p_in, t_params, jax.random.PRNGKey(5), 1 << 20)
        ref = pmc_update(p_in, sT, wgt, transposed=True, dof_solver_steps=100)
        scale = np.abs(np.asarray(ref.params.cov)).max(axis=(1, 2))
        cov_err = (np.abs(np.asarray(res.params.cov)
                          - np.asarray(ref.params.cov)).max(axis=(1, 2)) / scale)
        ok = bool(res.rho is None)
        ok &= np.allclose(np.asarray(res.params.means),
                          np.asarray(ref.params.means), rtol=1e-3, atol=1e-3)
        ok &= bool(cov_err.max() < 1e-3)
        ok &= np.allclose(np.asarray(res.params.weights),
                          np.asarray(ref.params.weights), rtol=1e-4, atol=1e-6)
        if p_in.is_student_t:
            ok &= np.allclose(np.asarray(res.params.dof),
                              np.asarray(ref.params.dof), rtol=1e-4)
        ok &= np.isclose(float(sw[0]), float(jnp.sum(wgt)), rtol=1e-5)
        ok &= np.isclose(float(sw[1]), float(jnp.sum(wgt * wgt)), rtol=1e-5)
        wl = jnp.where(wgt > 0, wgt * jnp.log(jnp.where(wgt > 0, wgt, 1.0)), 0.0)
        ok &= np.isclose(float(sw[2]), float(jnp.sum(wl)), rtol=1e-4)
        # padded-lane masking: odd N must give identical statistics scale
        res_odd, sT_o, w_o, _, sw_odd = pmc_step_mixture_target(
            p_in, t_params, jax.random.PRNGKey(5), (1 << 20) - 333)
        ok &= np.isclose(float(sw_odd[0]), float(jnp.sum(w_o)), rtol=1e-5)
        ok &= bool(np.isfinite(np.asarray(res_odd.params.means)).all())
        check("one-kernel IS+PMC step (%s)" % tname, bool(ok))

    # ---- 6b. K-BLOCKED one-kernel IS+PMC step (K*D past the dense cap) -- #
    for tname, st in [("gauss", False), ("student_t", True)]:
        kk = 80
        mr = rng.normal(0, 3, size=(kk, 2)).astype(np.float32)
        cr = np.array([np.eye(2, dtype=np.float32) * 2.0] * kk)
        dofr = np.full((kk,), 8.0, np.float32) if st else None
        pr, _ = core.make_mixture(mr, cr, None, dofr)
        t2_means = np.stack([rng.normal(0, 1, 2),
                             rng.normal(0, 1, 2) + 3.0]).astype(np.float32)
        t2_covs = np.array([np.eye(2) * 0.8] * 2).astype(np.float32)
        t2p, _ = core.make_mixture(t2_means, t2_covs,
                                   np.array([0.3, 0.7], np.float32))
        # force the K-blocked kernel: the auto policy would route this
        # shape (rho only ~0.3 GB) to the XLA path -- the point here is to
        # validate the blocked kernel itself against that XLA path
        res, sT, wgt, lat, sw = pmc_step_mixture_target(
            pr, t2p, jax.random.PRNGKey(7), 1 << 20, fused="blocked")
        ref = pmc_update(pr, sT, wgt, transposed=True, dof_solver_steps=100,
                         fused="off")
        ok = bool(res.rho is None)
        ok &= np.allclose(np.asarray(res.params.weights),
                          np.asarray(ref.params.weights), rtol=1e-3, atol=1e-6)
        ok &= np.allclose(np.asarray(res.params.means),
                          np.asarray(ref.params.means), rtol=1e-2, atol=1e-2)
        scale = np.abs(np.asarray(ref.params.cov)).max(axis=(1, 2))
        cov_err = (np.abs(np.asarray(res.params.cov)
                          - np.asarray(ref.params.cov)).max(axis=(1, 2)) / scale)
        ok &= bool(cov_err.max() < 2e-2)
        ok &= np.isclose(float(sw[0]), float(jnp.sum(wgt)), rtol=1e-5)
        ok &= bool(np.asarray(lat).max() < kk) and bool(np.asarray(lat).min() >= 0)
        check("K-blocked one-kernel IS+PMC step (K=80, D=2, %s)" % tname,
              bool(ok))

    check("chi2 sampler moments",
          np.isfinite(draws).all()
          and np.isclose(draws.mean(), 8.0, rtol=0.02)
          and np.isclose(draws.var(), 16.0, rtol=0.05))

    # ---- 8. fused MCMC chain pool ---- #
    from pypmc_tpu.ops.pallas_kernels import fused_mcmc_pool

    dm = 4
    t_mean = rng.normal(0, 1, size=(1, dm)).astype(np.float32)
    am = rng.normal(0, 0.3, size=(1, dm, dm)).astype(np.float32)
    t_cov = (np.eye(dm, dtype=np.float32)[None]
             + np.einsum("kij,klj->kil", am, am)).astype(np.float32)
    mc_params, mc_valid = core.make_mixture(t_mean, t_cov)
    assert bool(np.asarray(mc_valid).all())
    t_ops = core._pallas_operands(mc_params, "inv_chol")
    Cc, n_mc = 2048, 1000
    x0 = (t_mean[0][None, :]
          + rng.normal(0, 1, size=(Cc, dm))).astype(np.float32)
    x0T = jnp.asarray(x0.T.copy())
    e0 = core.mixture_logpdf_T(mc_params, x0T)
    pchol = (np.linalg.cholesky(t_cov[0]) * (2.38 / np.sqrt(dm))).astype(np.float32)
    cholr = jnp.asarray(np.ascontiguousarray(
        np.broadcast_to(pchol, (Cc, dm, dm)).transpose(1, 2, 0)
    ).reshape(dm * dm, Cc))
    pts, acc, _nan, xf, ef = fused_mcmc_pool(
        jnp.array([11, 7], jnp.int32), x0T, e0, cholr, None, t_ops,
        n_steps=n_mc, dim=dm)
    pts = np.asarray(pts)
    rate = float(np.asarray(acc).mean()) / n_mc
    # final-state consistency: last point == xf, ef == logpdf(xf)
    ok = np.allclose(pts[-1], np.asarray(xf))
    ok &= np.allclose(np.asarray(core.mixture_logpdf_T(mc_params, xf)),
                      np.asarray(ef), rtol=1e-3, atol=1e-3)
    # optimally-scaled random walk on a Gaussian target: accept ~0.23-0.45
    ok &= 0.15 < rate < 0.55
    # moment recovery over the pooled post-burn-in points
    kept = pts[n_mc // 2:].transpose(0, 2, 1).reshape(-1, dm)
    ok &= np.allclose(kept.mean(axis=0), t_mean[0], atol=0.1)
    ok &= np.allclose(np.cov(kept, rowvar=False), t_cov[0], atol=0.2)
    # determinism per seed
    pts2, _, _, _, _ = fused_mcmc_pool(
        jnp.array([11, 7], jnp.int32), x0T, e0, cholr, None, t_ops,
        n_steps=n_mc, dim=dm)
    ok &= np.array_equal(pts, np.asarray(pts2))
    # distinct across seeds
    pts3, _, _, _, _ = fused_mcmc_pool(
        jnp.array([12, 7], jnp.int32), x0T, e0, cholr, None, t_ops,
        n_steps=n_mc, dim=dm)
    ok &= not np.array_equal(pts, np.asarray(pts3))
    check("fused MCMC chain pool (moments/accept/determinism)", bool(ok))

    # Student-t proposal variant: heavier steps, still correct moments
    pts_t, acc_t, _, _, _ = fused_mcmc_pool(
        jnp.array([5, 3], jnp.int32), x0T, e0, cholr, 5.0, t_ops,
        n_steps=n_mc, dim=dm)
    kept_t = np.asarray(pts_t)[n_mc // 2:].transpose(0, 2, 1).reshape(-1, dm)
    rate_t = float(np.asarray(acc_t).mean()) / n_mc
    check("fused MCMC chain pool (Student-t proposal)",
          bool(0.1 < rate_t < 0.55
               and np.allclose(kept_t.mean(axis=0), t_mean[0], atol=0.1)
               and np.allclose(np.cov(kept_t, rowvar=False), t_cov[0],
                               atol=0.2)))

    print("%d checks failed" % len(failures))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
