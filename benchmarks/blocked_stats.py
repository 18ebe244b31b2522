"""K-blocked fused PMC statistics throughput (large K*D, past the dense
kernels' K*D <= 128 VMEM cap).

Workload shapes from the reference's mixture-reduction pipeline
(``examples/mixture_reduction.py:34-42``: a K=400 mixture from chain
patches) plus a large-D case.  Compares the K-blocked single-pass kernel
against the unfused XLA path (which materializes the (K, N) responsibility
matrix in HBM).

    python benchmarks/blocked_stats.py [--particles 8388608]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_case(K, D, N, student_t, reps=5):
    import jax
    import jax.numpy as jnp
    from pypmc_tpu.density import core
    from pypmc_tpu.mix_adapt.pmc import pmc_update

    rng = np.random.default_rng(0)
    means = rng.normal(0, 3.0 / np.sqrt(D), size=(K, D)).astype(np.float32)
    a = rng.normal(0, 0.1, size=(K, D, D)).astype(np.float32)
    covs = (np.eye(D, dtype=np.float32)[None]
            + np.einsum("kij,klj->kil", a, a)).astype(np.float32)
    dofs = np.full((K,), 8.0, np.float32) if student_t else None
    params, valid = core.make_mixture(means, covs, None, dofs)
    assert bool(np.asarray(valid).all())
    samples_T, _ = core.propose_T(params, jax.random.PRNGKey(1), N)
    samples_T = jax.block_until_ready(samples_T)
    w = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (N,)) * 0.2 + 1.0)

    def timed(disable_pallas):
        if disable_pallas:
            os.environ["PYPMC_TPU_DISABLE_PALLAS"] = "1"
        pmc_update.clear_cache()
        try:
            out = pmc_update(params, samples_T, w, transposed=True)
            jax.tree.map(lambda x: np.asarray(x), out.params)  # compile+sync
            times = []
            for r in range(reps):
                # vary the weights so the tunnel cannot serve a cached call
                wv = w * (1.0 + 1e-6 * r)
                t0 = time.perf_counter()
                out = pmc_update(params, samples_T, wv, transposed=True)
                np.asarray(out.params.weights)
                times.append(time.perf_counter() - t0)
        finally:
            os.environ.pop("PYPMC_TPU_DISABLE_PALLAS", None)
            pmc_update.clear_cache()
        return float(np.median(times))

    dt_fused = timed(False)
    dt_xla = timed(True)
    return {
        "K": K, "D": D, "N": N, "student_t": student_t,
        "fused_blocked_ms": round(dt_fused * 1e3, 1),
        "xla_ms": round(dt_xla * 1e3, 1),
        "fused_samples_per_s": int(N / dt_fused),
        "speedup": round(dt_xla / dt_fused, 2),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1 << 23)
    args = ap.parse_args()
    for K, D, st in [(400, 2, False), (400, 2, True), (64, 40, False)]:
        print(json.dumps(bench_case(K, D, args.particles, st)), flush=True)
