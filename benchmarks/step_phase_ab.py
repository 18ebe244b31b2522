"""Decompose the fused IS step's remaining per-sample cost (round 5).

After the polynomial circle fold and the streamed one-hot gathers, the
speed-of-light question moved: how much of the remaining kernel time is
(a) the Student-t chi-square machinery, (b) the target evaluation, and
(c) the irreducible propose+logq core?  Times four configurations of the
SAME fused kernel at the bench shape (N=2^26, K=10, D=10):

    student-t proposal + target eval   (the headline step)
    student-t proposal, logq only
    gaussian  proposal + target eval
    gaussian  proposal, logq only

    python benchmarks/step_phase_ab.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, KT, D, N, REPS = 10, 2, 10, 1 << 26, 10


def main():
    import jax
    import jax.numpy as jnp
    from pypmc_tpu.density import core

    rng = np.random.default_rng(0)
    dt = np.float32
    means = rng.normal(0, 3, (K, D)).astype(dt)
    a = rng.normal(0, 0.2, (K, D, D)).astype(dt)
    covs = (np.eye(D, dtype=dt)[None] * 1.5 + np.einsum("kij,klj->kil", a, a))
    params_t, _ = core.make_mixture(means, covs, None, np.full(K, 8.0, dt))
    params_g, _ = core.make_mixture(means, covs, None)
    t_means = np.stack([rng.normal(0, 1, D),
                        rng.normal(0, 1, D) + 3.0]).astype(dt)
    t_covs = np.array([np.eye(D) * 0.8] * KT).astype(dt)
    tparams, _ = core.make_mixture(t_means, t_covs, np.array([0.3, 0.7], dt))

    def timed(label, params, with_target):
        @jax.jit
        def step(params, tp, key):
            out = core.propose_logq_T(params, key, N,
                                      tp if with_target else None)
            return (jnp.sum(out[2]) + (jnp.sum(out[3]) if with_target
                                       else 0.0))

        key = jax.random.PRNGKey(0)
        float(step(params, tparams, key))  # compile + block
        ts = []
        for i in range(REPS):
            k = jax.random.fold_in(key, i + 1)
            t0 = time.perf_counter()
            float(step(params, tparams, k))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print("%-34s %7.1f ms  %6.2f ns/sample  %6.1f M/s"
              % (label, med * 1e3, med / N * 1e9, N / med / 1e6), flush=True)
        return med

    t_full = timed("student-t propose + logq + logp", params_t, True)
    t_noT = timed("student-t propose + logq", params_t, False)
    g_full = timed("gaussian  propose + logq + logp", params_g, True)
    g_noT = timed("gaussian  propose + logq", params_g, False)

    print("\nphase deltas (same-dispatch differences, ns/sample):")
    print("  target eval (KT=%d): %.2f (t) / %.2f (g)"
          % (KT, (t_full - t_noT) / N * 1e9, (g_full - g_noT) / N * 1e9))
    print("  chi-square machinery: %.2f (with target) / %.2f (logq only)"
          % ((t_full - g_full) / N * 1e9, (t_noT - g_noT) / N * 1e9))


if __name__ == "__main__":
    main()
