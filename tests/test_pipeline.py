"""End-to-end evidence pipeline (compact version of
``examples/uniting_markov_chains_and_variational_bayes.py``, the reference's
flagship acceptance check): MCMC prerun -> R-grouped long-patches mixture ->
VB -> importance sampling -> weighted VB refinement -> combined-weights
evidence estimate.  The integral of the normalized target is analytically 1.
"""

import numpy as np
import pytest

import pypmc_tpu as pt


@pytest.mark.slow
def test_evidence_pipeline_recovers_unit_integral():
    dim = 2
    rng = np.random.default_rng(99)

    target_mixture = pt.density.create_t_mixture(
        [np.array([-6.0, 7.3]), np.array([-7.0, 8.0]), np.array([-8.5, 7.5])],
        [np.array([[0.8, -0.3], [-0.3, 1.25]]),
         np.array([[0.5, 0.0], [0.0, 0.2]]),
         np.array([[0.5, 0.2], [0.2, 0.2]])],
        [13, 17, 5],
        [0.3, 0.4, 0.3],
    )
    log_target = target_mixture.evaluate_fn()

    # ---- MCMC prerun: 6 chains from random starts ---- #
    mc_prop = pt.density.LocalGauss(np.eye(dim) * 2.38**2 / dim)
    mcs = []
    seed = 0
    while len(mcs) < 6:
        start = rng.uniform(-10, 10, size=dim)
        try:
            mcs.append(pt.sampler.AdaptiveMarkovChain(log_target, mc_prop, start, rng=seed))
            seed += 1
        except ValueError:
            continue
    for mc in mcs:
        for i in range(8):
            mc.run(300)
            mc.adapt()
            if i == 0:
                mc.clear()

    chains = [mc.samples[:] for mc in mcs]
    mc_samples = np.vstack(chains)

    # ---- long patches + VB ---- #
    long_patches = pt.mix_adapt.make_r_gaussmix(chains, K_g=8)
    vb = pt.mix_adapt.GaussianInference(
        mc_samples[::50], initial_guess=long_patches, W0=np.eye(dim) * 1e10
    )
    vb.run(500, rel_tol=1e-8, abs_tol=1e-5, prune=0.5 * len(vb.data) / vb.K)
    vbmix = vb.make_mixture()

    # ---- IS + weighted VB refinement ---- #
    sampler = pt.sampler.ImportanceSampler(log_target, vbmix, rng=1)
    sampler.run(800)

    prior = vb.posterior2prior()
    prior.pop("alpha0")
    vb2 = pt.mix_adapt.GaussianInference(
        sampler.samples[:], initial_guess=vbmix,
        weights=sampler.weights[:][:, 0], **prior,
    )
    vb2.run(500, rel_tol=1e-8, abs_tol=1e-5)
    vb2mix = vb2.make_mixture()

    sampler.proposal = vb2mix
    sampler.run(4000)

    combined = pt.sampler.combine_weights(
        [s[:] for s in sampler.samples],
        [w[:][:, 0] for w in sampler.weights],
        [vbmix, vb2mix],
    )[:][:, 0]

    integral = combined.sum() / len(combined)
    error = np.sqrt(
        (combined**2).sum() / len(combined) - integral**2
    ) / np.sqrt(len(combined) - 1)

    # analytical value is 1; require agreement within max(5 sigma, 3%)
    assert abs(integral - 1.0) < max(5 * error, 0.03), (integral, error)
    assert float(pt.tools.perp(combined)) > 0.5
    assert float(pt.tools.ess(combined)) > 0.4
