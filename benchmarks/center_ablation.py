"""A/B the in-kernel evaluation centering on the headline fused IS step.

Round 2 added per-evaluation coordinate centering (``x - c`` inside the
kernel, for translation-invariant split-precision accuracy) and the
driver-captured headline bench dropped ~10% vs round 1.  This isolates the
centering's cost by timing ``fused_propose_logq`` with ``centered`` on/off
(everything else identical).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import make_problem, K, KT, D, N, REPS  # noqa: E402
from pypmc_tpu.density import core  # noqa: E402
from pypmc_tpu.ops.pallas_kernels import fused_propose_logq  # noqa: E402


def run(centered):
    means, covs, dofs, weights, t_means, t_covs, t_weights = make_problem(np.float32)
    params, _ = core.make_mixture(means, covs, weights, dofs)
    t_params, _ = core.make_mixture(t_means, t_covs, t_weights)

    cumw = jnp.cumsum(params.weights).reshape(K, 1)
    ct2 = params.chol.reshape(K * D, D)
    a2, b2, log_norm, wk, dof_col, center = core._pallas_operands(params, "inv_chol")
    dof_row = params.dof.reshape(1, K)
    target = core._pallas_operands(t_params, "inv_chol")

    @jax.jit
    def step(seed):
        x, lat, logq, logp = fused_propose_logq(
            seed, cumw, ct2, params.means.T, dof_row,
            a2, b2, log_norm, wk, dof_col, center, target,
            n=N, dim=D, centered=centered)
        w = jnp.exp(logp - logq)
        return jnp.sum(w), jnp.sum(w * w)

    key = jax.random.PRNGKey(0)
    seed0 = jax.lax.bitcast_convert_type(jax.random.bits(key, (2,), "uint32"), jnp.int32)
    jax.tree.map(float, step(seed0))  # compile
    times = []
    for i in range(REPS):
        s = jax.lax.bitcast_convert_type(
            jax.random.bits(jax.random.fold_in(key, i + 1), (2,), "uint32"), jnp.int32)
        t0 = time.perf_counter()
        jax.tree.map(float, step(s))
        times.append(time.perf_counter() - t0)
    return N / np.median(times), N / min(times)


if __name__ == "__main__":
    for centered in (True, False, True, False):
        med, best = run(centered)
        print("centered=%s  median %.1fM  best %.1fM samples/s" %
              (centered, med / 1e6, best / 1e6), flush=True)
