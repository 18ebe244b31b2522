"""K-blocked fused PMC statistics throughput (large K*D, past the dense
kernels' K*D <= 128 VMEM cap).

Workload shapes from the reference's mixture-reduction pipeline
(``examples/mixture_reduction.py:34-42``: a K=400 mixture from chain
patches) plus a large-D case.  Compares the K-blocked single-pass kernel
against the unfused XLA path (which materializes the (K, N) responsibility
matrix in HBM -- 13.4 GB at K=400, N=2^23, so the XLA path is measured in a
SUBPROCESS at the largest N that fits; an in-process OOM leaves the device
allocator poisoned for subsequent runs).

    python benchmarks/blocked_stats.py [--particles 8388608]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(K, D, N, student_t, xla, reps=5):
    """One measurement in THIS process; returns median seconds per update."""
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

    if xla:
        os.environ["PYPMC_TPU_DISABLE_PALLAS"] = "1"
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
    return float(np.median(times))


def measure_subprocess(K, D, N, student_t, xla):
    """Run one measurement isolated in a child process (an OOM'd XLA attempt
    must not poison the device for the next measurement); returns median
    seconds or None if the shape does not fit."""
    cmd = [sys.executable, os.path.abspath(__file__), "--one-case",
           "--K", str(K), "--D", str(D), "--particles", str(N)]
    if student_t:
        cmd.append("--student-t")
    if xla:
        cmd.append("--xla")
    r = subprocess.run(cmd, capture_output=True, text=True)
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)["seconds"]
        except (json.JSONDecodeError, KeyError):
            continue
    if "RESOURCE_EXHAUSTED" in r.stderr or "memory space hbm" in r.stderr:
        return None
    raise RuntimeError("subprocess failed:\n" + r.stderr[-2000:])


def bench_case(K, D, N, student_t):
    dt_fused = measure_subprocess(K, D, N, student_t, xla=False)
    assert dt_fused is not None, "fused path must fit at the benchmark shape"
    # the unfused path materializes the (K, N) responsibility matrix in HBM:
    # halve N until it fits and report its per-sample time there
    n_xla, dt_xla = N, None
    while n_xla >= 1 << 18:
        dt_xla = measure_subprocess(K, D, n_xla, student_t, xla=True)
        if dt_xla is not None:
            break
        n_xla //= 2
    return {
        "K": K, "D": D, "N": N, "student_t": student_t,
        "fused_blocked_ms": round(dt_fused * 1e3, 1),
        "xla_ms": None if dt_xla is None else round(dt_xla * 1e3, 1),
        "xla_n": n_xla if dt_xla is not None else 0,
        "xla_oom_at_full_n": n_xla != N,
        "fused_samples_per_s": int(N / dt_fused),
        "xla_samples_per_s": None if dt_xla is None else int(n_xla / dt_xla),
        "per_sample_speedup": None if dt_xla is None else round(
            (dt_xla / n_xla) / (dt_fused / N), 2),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=1 << 23)
    ap.add_argument("--one-case", action="store_true")
    ap.add_argument("--K", type=int)
    ap.add_argument("--D", type=int)
    ap.add_argument("--student-t", action="store_true")
    ap.add_argument("--xla", action="store_true")
    args = ap.parse_args()
    if args.one_case:
        dt = measure(args.K, args.D, args.particles, args.student_t, args.xla)
        print(json.dumps({"seconds": dt}), flush=True)
    else:
        for K, D, st in [(400, 2, False), (400, 2, True), (64, 40, False)]:
            print(json.dumps(bench_case(K, D, args.particles, st)), flush=True)
