"""Benchmark: importance-sampling throughput (samples/s/chip) on the
flagship workload -- a Student-t mixture proposal (K=10, D=10) evaluated
against a bimodal Gaussian target, the full fused step
propose -> evaluate-proposal -> evaluate-target -> importance-weights.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (pypmc) cannot be built here (no Cython in the
image), so the baseline is a numpy CPU implementation of the same step with
per-component vectorized evaluation.  This is GENEROUS to the reference:
pypmc's actual IS weight path is a per-sample Python loop over Cython
single-point evaluates (``sampler/importance_sampling.py:197-215``), which is
strictly slower than the vectorized numpy used here -- so ``vs_baseline``
understates the true speedup over the reference.
"""

import json
import time

import numpy as np

K = 10      # mixture components
D = 10      # dimension
N = 1 << 20 # particles per step (TPU)
N_CPU = 1 << 16  # particles per step for the numpy baseline (extrapolated)
REPS = 10


def make_problem(dtype):
    rng = np.random.default_rng(0)
    means = rng.normal(0.0, 3.0, size=(K, D)).astype(dtype)
    a = rng.normal(0.0, 0.2, size=(K, D, D)).astype(dtype)
    covs = (np.eye(D, dtype=dtype)[None] * 1.5 + np.einsum("kij,klj->kil", a, a)).astype(dtype)
    dofs = np.full((K,), 8.0, dtype=dtype)
    weights = np.full((K,), 1.0 / K, dtype=dtype)
    t_mu1 = rng.normal(0, 1, size=D).astype(dtype)
    t_mu2 = (t_mu1 + 3.0).astype(dtype)
    t_inv = np.linalg.inv(np.eye(D) * 0.8).astype(dtype)
    return means, covs, dofs, weights, t_mu1, t_mu2, t_inv


# ------------------------------------------------------------------ #
# numpy CPU baseline (vectorized reference semantics)                 #
# ------------------------------------------------------------------ #

def numpy_baseline_sps():
    from scipy.special import gammaln

    means, covs, dofs, weights, t_mu1, t_mu2, t_inv = make_problem(np.float64)
    chols = np.linalg.cholesky(covs)
    invs = np.linalg.inv(covs)
    _, logdets = np.linalg.slogdet(covs)
    log_norms = (
        gammaln(0.5 * (dofs + D)) - gammaln(0.5 * dofs)
        - 0.5 * D * np.log(dofs * np.pi) - 0.5 * logdets
    )
    rng = np.random.RandomState(1)

    def step(n):
        # propose: multinomial allocation + per-component transform
        counts = rng.multinomial(n, weights)
        blocks = []
        for k in range(K):
            if counts[k] == 0:
                continue
            z = rng.normal(0, 1, (counts[k], D))
            chi2 = rng.chisquare(dofs[k], counts[k])
            blocks.append(
                means[k] + z.dot(chols[k].T) * np.sqrt(dofs[k] / chi2)[:, None]
            )
        samples = np.vstack(blocks)
        rng.shuffle(samples)
        # proposal log-pdf: per-component vectorized evaluate + logsumexp
        logq_k = np.empty((n, K))
        for k in range(K):
            diff = samples - means[k]
            maha = np.einsum("ni,ij,nj->n", diff, invs[k], diff)
            logq_k[:, k] = log_norms[k] - 0.5 * (dofs[k] + D) * np.log1p(maha / dofs[k])
        m = logq_k.max(axis=1, keepdims=True)
        log_q = np.log(np.sum(weights * np.exp(logq_k - m), axis=1)) + m[:, 0]
        # target
        d1 = samples - t_mu1
        d2 = samples - t_mu2
        e1 = -0.5 * np.einsum("ni,ij,nj->n", d1, t_inv, d1) + np.log(0.3)
        e2 = -0.5 * np.einsum("ni,ij,nj->n", d2, t_inv, d2) + np.log(0.7)
        mm = np.maximum(e1, e2)
        log_p = mm + np.log(np.exp(e1 - mm) + np.exp(e2 - mm))
        return np.exp(log_p - log_q)

    step(1024)  # warm caches
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        step(N_CPU)
        times.append(time.perf_counter() - t0)
    return N_CPU / np.median(times)


# ------------------------------------------------------------------ #
# TPU measurement                                                     #
# ------------------------------------------------------------------ #

def tpu_sps():
    import jax
    import jax.numpy as jnp
    from pypmc_tpu.density import core

    means, covs, dofs, weights, t_mu1, t_mu2, t_inv = make_problem(np.float32)
    params, valid = core.make_mixture(means, covs, weights, dofs)
    assert bool(np.asarray(valid).all())
    t_mu1, t_mu2, t_inv = jnp.asarray(t_mu1), jnp.asarray(t_mu2), jnp.asarray(t_inv)

    def log_target(x):
        d1 = x - t_mu1
        d2 = x - t_mu2
        e1 = -0.5 * d1 @ t_inv @ d1 + jnp.log(0.3)
        e2 = -0.5 * d2 @ t_inv @ d2 + jnp.log(0.7)
        m = jnp.maximum(e1, e2)
        return m + jnp.log(jnp.exp(e1 - m) + jnp.exp(e2 - m))

    @jax.jit
    def step(params, key):
        samples, latent = core.propose(params, key, N)
        log_q = core.mixture_logpdf(params, samples)
        log_p = jax.vmap(log_target)(samples)
        return jnp.exp(log_p - log_q)

    key = jax.random.PRNGKey(0)
    w = step(params, key)
    w.block_until_ready()  # compile
    times = []
    for i in range(REPS):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        step(params, k).block_until_ready()
        times.append(time.perf_counter() - t0)
    return N / np.median(times)


def main():
    cpu = numpy_baseline_sps()
    tpu = tpu_sps()
    print(json.dumps({
        "metric": "is_samples_per_s_per_chip",
        "value": round(tpu, 1),
        "unit": "samples/s",
        "vs_baseline": round(tpu / cpu, 2),
    }))


if __name__ == "__main__":
    main()
