"""VPU speed-of-light microbenchmark: measured per-element cost of every
elementary op in the propose kernel's budget (VERDICT r4 item 2).

Round-4's "60-100% of the VPU issue-rate bound" claim rested on an
ESTIMATE of Mosaic's transcendental lowering costs.  This harness measures
them: one Pallas kernel per (op, reps) pair computes ``reps`` independent
applications of the op over an (8, T) float32 tile resident in VMEM,
accumulating into the output.  The per-op cost is the SLOPE between two
rep counts -- fixed overhead (dispatch, HBM read/write of the tile,
accumulate chain) cancels exactly; the accumulate itself (one mul + one
add per rep) is measured as its own 'muladd' row and subtracted.

    python benchmarks/vpu_microbench.py            # all ops
    python benchmarks/vpu_microbench.py exp log    # subset

Output: one table row per op -- ns per element and VPU lane-ops at the
measured clock -- plus the recomputed propose-kernel speed-of-light.
Numbers feed BENCHMARKS.md "VPU speed of light (measured)".
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBLANES = 8          # f32 sublane count: full VPU utilization layout
TILE_T = 16384        # lanes per grid step: (8, 16384) f32 = 512 KiB block
GRID = 256            # tiles per kernel call (33.5M elems: cheap-op slopes
                      # must clear the tunnel's ~ms dispatch jitter)
R_LO, R_HI = 16, 112  # rep counts; cost = slope between them
CALLS = 11            # timed calls per point (median)


def _make_bench(op_body, reps):
    """Build a jitted pallas_call computing ``reps`` independent
    applications of ``op_body(x, i)`` accumulated into the output tile."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        # seed the hardware PRNG (needed by the RNG rows; a fixed cost for
        # the others that cancels in the rep-count slope)
        pltpu.prng_seed(pl.program_id(0), 12345)
        x = x_ref[:]
        acc = x
        for i in range(reps):
            # the damped-accumulator recurrence makes the chain
            # algebraically unfoldable (a plain `acc += x * c_i` collapses
            # to `x * sum(c_i)` in the compiler and measures nothing);
            # the damp FMA itself is part of the 'muladd' baseline row
            acc = acc * np.float32(0.9990234) + op_body(x, i)
        o_ref[:] = acc

    @jax.jit
    def run(x):
        out = pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((SUBLANES, TILE_T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SUBLANES, TILE_T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(x)
        return jnp.sum(out)  # scalar out: only 4 bytes cross the tunnel

    return run


def _op_table():
    """op name -> per-rep body(x, i).  ``x`` is uniform in [0.1, 0.9];
    the (1 + i*1e-3) factor keeps rep applications CSE-distinct."""
    import jax
    import jax.numpy as jnp

    from pypmc_tpu.ops import pallas_kernels as pk

    def c(i):
        return np.float32(1.0 + i * 1e-3)

    shape = (SUBLANES, TILE_T)

    def uniform(x, i):
        return pk._kernel_uniform(shape, offset=0) * c(i)

    def normal_bm_pair(x, i):
        a, b = pk._kernel_normal_pair(shape)
        return (a + b) * c(i)

    def normal_pair_trig(x, i):
        # the pre-round-5 Box-Muller halves: hardware sin/cos
        u1 = pk._kernel_uniform(shape, offset=1)
        u2 = pk._kernel_uniform(shape, offset=0)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * jnp.pi) * u2
        return (r * jnp.cos(theta) + r * jnp.sin(theta)) * c(i)

    def normal_pair_poly(x, i):
        # the round-5 polynomial circle fold
        u1 = pk._kernel_uniform(shape, offset=1)
        u2 = pk._kernel_uniform(shape, offset=0)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        cs, sn = pk._sincos_2pi(u2)
        return (r * cs + r * sn) * c(i)

    def sincos_poly(x, i):
        cs, sn = pk._sincos_2pi(x * (np.float32(0.25) * c(i)))
        return cs + sn

    return {
        # accumulate-chain baseline: subtracted from every other row
        "muladd": lambda x, i: x * c(i),
        "add": lambda x, i: x + c(i),
        "div": lambda x, i: c(i) / (x + np.float32(1.37)),
        "sqrt": lambda x, i: jnp.sqrt(x * c(i)),
        "rsqrt": lambda x, i: jax.lax.rsqrt(x * c(i)),
        "exp": lambda x, i: jnp.exp(x * c(i)),
        "log": lambda x, i: jnp.log(x * c(i)),
        "sin": lambda x, i: jnp.sin(x * c(i)),
        "cos": lambda x, i: jnp.cos(x * c(i)),
        "tanh": lambda x, i: jnp.tanh(x * c(i)),
        "pow": lambda x, i: (x * c(i)) ** np.float32(1.5),
        # in-kernel RNG building blocks (hardware PRNG + cast)
        "uniform": uniform,
        # one Box-Muller draw = TWO normals (cost rows are per PAIR)
        "normal_bm_pair": normal_bm_pair,
        "normal_pair_trig": normal_pair_trig,
        "normal_pair_poly": normal_pair_poly,
        "sincos_poly": sincos_poly,
    }


def measure(name, body):
    import jax

    import jax.numpy as jnp

    # generate on DEVICE: a host->device transfer of the 33 MB operand
    # takes minutes through the tunneled chip
    x = jax.jit(lambda k: jax.random.uniform(
        k, (SUBLANES, TILE_T * GRID), jnp.float32, 0.1, 0.9)
    )(jax.random.PRNGKey(0))
    x.block_until_ready()
    elems = SUBLANES * TILE_T * GRID

    med = {}
    for reps in (R_LO, R_HI):
        run = _make_bench(body, reps)
        float(run(x))  # compile + warm
        ts = []
        for _ in range(CALLS):
            t0 = time.perf_counter()
            float(run(x))
            ts.append(time.perf_counter() - t0)
        med[reps] = float(np.median(ts))
    slope_s = (med[R_HI] - med[R_LO]) / (R_HI - R_LO)
    return slope_s / elems * 1e9  # ns per element per application


def main():
    only = set(sys.argv[1:])
    table = _op_table()
    if only:
        table = {k: v for k, v in table.items() if k in only or k == "muladd"}

    results = {}
    for name, body in table.items():
        ns = measure(name, body)
        results[name] = ns
        print("%-16s %8.4f ns/elem (raw slope)" % (name, ns), flush=True)

    base = results.get("muladd", 0.0)
    print("\nop cost net of the accumulate chain (muladd baseline"
          " %.4f ns/elem):" % base)
    print("%-16s %10s %12s" % ("op", "ns/elem", "vs muladd"))
    for name, ns in results.items():
        if name == "muladd":
            continue
        net = ns - base
        print("%-16s %10.4f %12.1fx"
              % (name, net, net / base if base > 0 else float("nan")))

    # Propose-kernel speed-of-light from the measured numbers.
    # Per Student-t sample at D=10 (BENCHMARKS.md "Where the 2.06 ns go"):
    #   normals: D/2 BM pairs for the proposal draw
    #   chi-square: 6 MT rounds in the 8-row layout = 3 BM pairs + 6
    #     uniforms + ~13 logs (log u, 3 log safe... counted below) + final
    #     boost, all at 1/1 lane occupancy, PLUS exp/log for the scale
    #   evaluation: K=10 components x (exp) for the LSE, one log
    n = {k: results.get(k, 0.0) - base for k in results}
    if not only:
        d_, k_ = 10, 10
        draw = (d_ / 2) * n["normal_bm_pair"]
        chi2 = (3 * n["normal_bm_pair"] + 7 * n["uniform"]
                + (6 * 2 + 1) * n["log"] + 2 * n["exp"] + n["sqrt"]) / 8.0
        evl = (2 * k_ * n["exp"] + 2 * (k_ + 1) * n["log"]) / 1.0
        print("\npropose-kernel transcendental floor at D=%d K=%d:" % (d_, k_))
        print("  draw %.3f + chi2 %.3f + eval(2 mixtures) %.3f"
              " = %.3f ns/sample" % (draw, chi2, evl, draw + chi2 + evl))


if __name__ == "__main__":
    main()
