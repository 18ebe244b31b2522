"""A/B measurement of the propose-kernel layout work (VERDICT r3 item 7).

Times the Student-t propose+eval kernel (`core.propose_logq_T`, the
headline step's dominant phase) in isolation at the production batch, for
the two `_unrows8` implementations:

* roll:   8 sublane rotates (current default)
* matmul: 24 exact-selector MXU matmuls (`PYPMC_TPU_UNROWS8_MATMUL=1`)

`_unrows8` sits in the hottest Student-t path (the Marsaglia-Tsang
chi-square runs in the 8-row layout and its per-particle scale must come
back to the (1, T) lane layout).  Run each variant in its own process --
the env toggle is read at trace time:

    python benchmarks/propose_layout_ab.py
    PYPMC_TPU_UNROWS8_MATMUL=1 python benchmarks/propose_layout_ab.py
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
    params, _ = core.make_mixture(means, covs, None, np.full(K, 8.0, dt))
    t_means = np.stack([rng.normal(0, 1, D), rng.normal(0, 1, D) + 3.0]).astype(dt)
    t_covs = np.array([np.eye(D) * 0.8] * KT).astype(dt)
    tparams, _ = core.make_mixture(t_means, t_covs, np.array([0.3, 0.7], dt))

    @jax.jit
    def step(params, tparams, key):
        out = core.propose_logq_T(params, key, N, tparams)
        # reduce on device; only scalars cross the tunnel
        return jnp.sum(out[2]), jnp.sum(out[3])

    key = jax.random.PRNGKey(0)
    jax.tree.map(float, step(params, tparams, key))  # compile + block
    times = []
    for i in range(REPS):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.perf_counter()
        jax.tree.map(float, step(params, tparams, k))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    variant = "matmul" if os.environ.get("PYPMC_TPU_UNROWS8_MATMUL") else "roll"
    print("unrows8=%s: propose+eval %d samples median %.1f ms "
          "(%.2f ns/sample, %.1fM samples/s)"
          % (variant, N, med * 1e3, med / N * 1e9, N / med / 1e6))


if __name__ == "__main__":
    main()
