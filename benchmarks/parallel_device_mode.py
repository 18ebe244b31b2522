"""Measured cost of ParallelSampler's host gather vs the device-resident
mode (VERDICT r3 item 5).

At the 10^7-particle flagship (D=10 float32) every `run()` in host mode
moves ~400 MB of samples + 40 MB of weights device->host; `to_host=False`
keeps them sharded on device and `evidence_stats()` moves three scalars.

    python benchmarks/parallel_device_mode.py [--particles 10000000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pypmc_tpu as pt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    rng = np.random.default_rng(0)
    D, K = args.dim, args.k
    means = rng.normal(0, 3, (K, D))
    a = rng.normal(0, 0.2, (K, D, D))
    covs = np.eye(D)[None] * 1.5 + np.einsum("kij,klj->kil", a, a)
    proposal = pt.density.create_t_mixture(means, covs, np.full(K, 8.0))
    t_mix = pt.density.create_gaussian_mixture(
        np.stack([rng.normal(0, 1, D), rng.normal(0, 1, D) + 3.0]),
        np.array([np.eye(D) * 0.8] * 2), np.array([0.3, 0.7]))
    log_target = t_mix.evaluate_fn(batched=True)

    mesh = pt.parallel.particle_mesh()
    n_dev = mesh.devices.size
    n_per_dev = args.particles // n_dev

    for to_host in (False, True):
        ps = pt.parallel.ParallelSampler(log_target, proposal, mesh=mesh, rng=1)
        ps.run(n_per_dev, to_host=to_host)  # warm the compile cache
        ps.clear()
        times = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            ps.run(n_per_dev, to_host=to_host)
            if not to_host:
                # force completion of the async device work
                jax.block_until_ready(ps.device_runs[-1][1])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        label = "host History (gather every run)" if to_host else \
                "device-resident (to_host=False)"
        print("%s: %.1f ms/run for %.1e particles"
              % (label, med * 1e3, n_per_dev * n_dev))
        if not to_host:
            t0 = time.perf_counter()
            sw, sw2, n = ps.evidence_stats()
            t_stats = time.perf_counter() - t0
            print("  evidence_stats (device reduction, 3 scalars cross): "
                  "%.1f ms; Z=%.4f ess=%.3f"
                  % (t_stats * 1e3, sw / n, (sw * sw / sw2) / n))
            t0 = time.perf_counter()
            ps.gather()
            print("  deferred gather() of all pending runs: %.1f ms"
                  % ((time.perf_counter() - t0) * 1e3))


if __name__ == "__main__":
    main()
