"""Fused Pallas TPU kernels for the mixture hot path.

These kernels are the TPU-native analog of the reference's Cython layer: the
operations that dominate at N ~ 10^6..10^8 particles.

Layout: particles are carried TRANSPOSED, ``xT (D, N)`` ("structure of
arrays").  TPU tiles are (sublane, 128-lane); a row-major ``(N, D)`` array
with D ~ 2..40 pads every row to 128 lanes, wasting up to 98% of VPU lanes
and >10x HBM capacity/bandwidth.  In the transposed layout the huge particle
axis IS the lane axis, so every elementwise op runs at full width and the
per-tile matmuls stream ``(K*D, D) @ (D, TN)`` through the MXU.

* :func:`fused_logq` -- mixture log-density ``(N,)``: projection,
  Mahalanobis reduction, component log-pdfs and the weighted log-sum-exp in
  one pass; no O(N*K*D) HBM intermediates.
* :func:`fused_rho` -- same, plus the Rao-Blackwellized responsibilities
  ``rho (K, N)`` (the PMC E-step input, ``mix_adapt/pmc.pyx:23-43``).
* :func:`fused_maha` -- squared Mahalanobis distances ``(K, N)``.
* :func:`fused_transform` -- the mixture-proposal affine transform
  ``sample = mu[latent] + (chol[latent] @ z) * scale`` with the per-particle
  component select done in VMEM via one-hot contractions instead of an
  (N, D, D) parameter gather in HBM.
* :func:`fused_transform_rng` -- the same with ALL randomness generated
  in-kernel from the TPU hardware PRNG (paired Box-Muller normals; for
  Student-t the per-particle chi-square scale via Marsaglia-Tsang, run in
  an 8-sublane-row relayout for full VPU utilization).
* :func:`fused_propose_logq` -- the whole importance-sampling hot path in
  one kernel: propose, evaluate the proposal log-q, and optionally evaluate
  a mixture target's log-p, all on the VMEM-resident sample tile.

Mosaic does not support lane/sublane-splitting reshapes inside kernels, so
all per-component-block reductions are expressed as tiny 0/1 selector
matmuls.  Matmul precision is managed with manual bfloat16 splits (see the
"Split-precision matmuls" section): selector contractions are bit-exact at
3 one-pass matmuls, value matmuls run at ~2^-16 relative error -- half the
MXU cost of Precision.HIGHEST, which measured at ~44% of the whole fused
IS step.  N is padded to the lane-tile size internally; K and D are static
per compilation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_logq", "fused_rho", "fused_maha", "fused_transform",
           "fused_transform_rng", "fused_propose_logq", "fused_pmc_stats",
           "fused_vb_estep", "fused_is_pmc_step",
           "fused_pmc_stats_blocked", "fused_vb_estep_blocked",
           "fused_is_pmc_step_blocked", "fused_mcmc_pool",
           "pick_tile", "fits_vmem", "block_kb", "fits_vmem_blocked",
           "pick_tile_blocked", "pick_chain_block"]

# set True (e.g. from tests) to run the kernels in the Pallas interpreter --
# lets the kernel logic be verified on the CPU backend
INTERPRET = False


def _interpret():
    """Interpreter switch, read at TRACE time: the module global (tests
    monkeypatch it) or the ``PYPMC_TPU_PALLAS_INTERPRET`` environment
    variable (the multichip dryrun sets it so the FUSED kernels execute
    under the virtual CPU mesh instead of being disabled entirely)."""
    import os

    return INTERPRET or bool(os.environ.get("PYPMC_TPU_PALLAS_INTERPRET"))


def _pad8(n):
    return (n + 7) // 8 * 8


def _vmem_budget_default():
    """Per-kernel VMEM budget for tile sizing.  Larger tiles amortize the
    per-grid-step MXU weight fills and pipeline turnarounds; 6 MiB of the
    16 MiB VMEM leaves room for Pallas double-buffering.  Overridable via
    ``PYPMC_TPU_VMEM_BUDGET`` (bytes) for A/B tuning."""
    import os

    return int(os.environ.get("PYPMC_TPU_VMEM_BUDGET", 6 * 1024 * 1024))


_VMEM_BUDGET = _vmem_budget_default()

# Lane-tile quantum per kernel family.  Kernels whose hot loops use the
# :func:`_rows8` relayout (the in-kernel RNG / chi-square paths) need tiles
# that are multiples of 1024; pure evaluation/statistics kernels only need
# the 128-lane vreg width -- which lets them run fused for much larger
# ``K*D`` (a 128-lane tile of a K=64, D=40 mixture fits VMEM comfortably
# where a 1024-lane tile would not).
QUANTUM_RNG = 1024
QUANTUM_EVAL = 128


def _bytes_per_lane(K: int, D: int) -> int:
    """Per-particle-lane VMEM cost estimate: a handful of (pad8(K*D), TN),
    (pad8(K), TN) and (pad8(D), TN) float32 buffers."""
    return 4 * (3 * _pad8(K * D) + 3 * _pad8(K) + 3 * _pad8(D))


def fits_vmem(K: int, D: int, quantum: int = QUANTUM_RNG,
              vmem_budget_bytes: int = _VMEM_BUDGET) -> bool:
    """Whether a (K, D) mixture fits the kernels' VMEM budget at the MINIMUM
    particle tile (``quantum`` lanes -- :data:`QUANTUM_RNG` for the
    RNG/propose kernels, :data:`QUANTUM_EVAL` for evaluation/statistics
    kernels).  Callers must fall back to the unfused XLA path when this is
    False instead of calling the fused kernels."""
    return _bytes_per_lane(K, D) * quantum <= vmem_budget_bytes


def pick_tile(K: int, D: int, quantum: int = QUANTUM_RNG,
              vmem_budget_bytes: int = _VMEM_BUDGET) -> int:
    """Particle-tile (lane) size (see :func:`_bytes_per_lane`), a multiple
    of ``quantum`` (1024 where the kernel relayouts to 8 sublane rows of
    128-aligned lanes -- :func:`_rows8` -- otherwise the 128-lane vreg
    width).  Callers must gate on :func:`fits_vmem` first -- mixtures too
    large for the minimum tile belong on the unfused path."""
    tn = vmem_budget_bytes // max(1, _bytes_per_lane(K, D))
    tn = max(quantum, min(16384, int(tn)))
    return (tn // quantum) * quantum


def _pad_lanes(x, tile):
    """Pad the LAST axis of ``x`` to a multiple of ``tile``."""
    n = x.shape[-1]
    padded = (n + tile - 1) // tile * tile
    if padded == n:
        return x, n
    pad = [(0, 0)] * (x.ndim - 1) + [(0, padded - n)]
    return jnp.pad(x, pad), n


def _dot(x, y):
    """float32-accurate MXU matmul (the default TPU matmul precision uses
    bfloat16 passes, which costs ~3 decimal digits in the distances; Mosaic
    supports only DEFAULT and HIGHEST)."""
    return jnp.dot(x, y, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _dot01(x, y):
    """MXU matmul where one operand is exactly 0/1 and the other holds
    small integers (or 0/1): a single bf16 pass is already exact, at a
    fraction of the HIGHEST (multi-pass float32) cost."""
    return jnp.dot(x, y, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


# ------------------------------------------------------------------ #
# Split-precision matmuls.  Mosaic exposes only DEFAULT (one bfloat16
# pass, ~2^-8 relative error -- unusable for distances/samples) and
# HIGHEST (full float32, 6 passes on bf16-MXU TPUs -- measured at ~44% of
# the whole IS step).  A float32 splits EXACTLY into three bfloat16
# terms (3 x 8 mantissa bits), so matmuls where one operand is already
# bf16-exact (every 0/1 selector here) are BIT-EXACT with 3 DEFAULT
# passes, and general value matmuls reach ~2^-16 relative error with 3
# passes -- half the MXU cost of HIGHEST either way.
# ------------------------------------------------------------------ #

def _bf16_split2(v):
    """v ~= v0 + v1 with v0, v1 exactly bfloat16-representable (the
    ~2^-16-relative residual is dropped)."""
    v0 = v.astype(jnp.bfloat16).astype(jnp.float32)
    v1 = (v - v0).astype(jnp.bfloat16).astype(jnp.float32)
    return v0, v1


def _bf16_split3(v):
    """v == v0 + v1 + v2 EXACTLY, each term bfloat16-representable (the
    standard error-free 3-way split: each subtraction is exact in f32 and
    the final residual carries the last <=8 mantissa bits)."""
    v0 = v.astype(jnp.bfloat16).astype(jnp.float32)
    r = v - v0
    v1 = r.astype(jnp.bfloat16).astype(jnp.float32)
    return v0, v1, r - v1


def _dot_sel(s, v):
    """EXACT ``s @ v`` for a 0/1 selector ``s`` and float32 ``v``:
    3 one-pass matmuls over the exact 3-way split of ``v``."""
    v0, v1, v2 = _bf16_split3(v)
    return _dot01(s, v0) + _dot01(s, v1) + _dot01(s, v2)


def _dot_selr(v, s):
    """EXACT ``v @ s`` for float32 ``v`` and a 0/1 selector ``s``."""
    v0, v1, v2 = _bf16_split3(v)
    return _dot01(v0, s) + _dot01(v1, s) + _dot01(v2, s)


def _dot_acc(s, v):
    """``s @ v`` for a 0/1 selector ``s`` at ~2^-16 relative error:
    2 one-pass matmuls (enough for the squared-distance reductions)."""
    v0, v1 = _bf16_split2(v)
    return _dot01(s, v0) + _dot01(s, v1)


def _dot_val(x, y):
    """General float32 matmul at ~2^-16 relative error with 3 one-pass
    matmuls: x0@y0 + x0@y1 + x1@y0 (the dropped x1@y1 term is O(2^-16))."""
    x0, x1 = _bf16_split2(x)
    y0, y1 = _bf16_split2(y)
    return _dot01(x0, y0) + _dot01(x0, y1) + _dot01(x1, y0)


def _block_selector(K, kd, dim, dtype):
    """(K, K*D) 0/1 matrix summing each length-D sublane block:
    S[k, k*D+i] = 1."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (K, kd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (K, kd), 1) // dim
    return (rows == cols).astype(dtype)


def _pos_selector(dim, kd, dtype):
    """(D, K*D) 0/1 matrix extracting the within-block position:
    R[i, k*D+i] = 1."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (dim, kd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (dim, kd), 1) % dim
    return (rows == cols).astype(dtype)


def _block_sum(v, n_blocks, dim, exact=True):
    """Per-block sublane sums: ``(n_blocks*D, TN) -> (n_blocks, TN)``.

    Default: streamed sequential sublane reductions -- exact f32, ~D
    lane-ops per block and no MXU traffic.  ``PYPMC_TPU_GATHER=matmul``
    selects the 0/1-selector matmul form (3 exact / 2 approximate bf16
    passes + the bf16 split of the (n_blocks*D, TN) operand) for A/B;
    measured slower at every shape tried (BENCHMARKS.md round 5)."""
    if _gather_use_matmul():
        seg = _block_selector(n_blocks, n_blocks * dim, dim, v.dtype)
        return (_dot_sel if exact else _dot_acc)(seg, v)
    return jnp.concatenate(
        [jnp.sum(v[k * dim:(k + 1) * dim], axis=0, keepdims=True)
         for k in range(n_blocks)], axis=0)


def _block_expand(rows, n_blocks, dim):
    """Per-block broadcast: ``(n_blocks, TN) -> (n_blocks*D, TN)`` with
    row ``k`` repeated over its D block rows (layout inverse of
    :func:`_block_sum`); exact either way."""
    if _gather_use_matmul():
        seg = _block_selector(n_blocks, n_blocks * dim, dim, rows.dtype)
        return _dot_sel(seg.T, rows)
    return jnp.concatenate(
        [jnp.broadcast_to(rows[k:k + 1, :], (dim, rows.shape[1]))
         for k in range(n_blocks)], axis=0)


def _aug_eval_operand(a2, b2, center=None):
    """XLA-side prep: fold the projected means into the projection matrix,
    ``a_aug (K*D, D+1) = [a2 | b2']`` -- the kernel then gets the centered
    projection from ONE matmul against ``[x - c; -1]``.

    ``center (D,)`` shifts the coordinate origin: the kernels subtract it
    from every particle BEFORE the split-precision matmul and ``b2`` is
    re-projected accordingly (``b2' = b2 - a2 @ c``, exact linear algebra).
    With ``c`` = the mixture's weighted mean, the ~2^-16 relative matmul
    error scales with ``|U_k (x - c)|`` (the whitened spread of the data
    around the mixture) instead of ``|U_k x|`` -- making the fused
    evaluations translation-invariant in accuracy."""
    if center is not None:
        b2 = b2 - jnp.einsum("id,d->i", a2, center,
                             precision="highest")[:, None]
    return jnp.concatenate([a2, b2], axis=1)


def _center_or_zero(center, dim, dtype):
    """XLA-side: (D, 1) centering column for the kernels (zeros if None)."""
    if center is None:
        return jnp.zeros((dim, 1), dtype=dtype)
    return center.reshape(dim, 1).astype(dtype)


def _component_logpdfs_tile(x, c, a_aug, log_norm, dof, dim):
    """(K, TN) component log-densities from a (D, TN) tile.

    ``a_aug (K*D, D+1)`` stacks the inverse-Cholesky factors with the
    re-projected means appended as the last column
    (:func:`_aug_eval_operand`); ``c (D, 1)`` is the coordinate center
    subtracted from the tile first, so the Mahalanobis distances come from
    one streaming MXU matmul against ``[x - c; -1]`` plus a selector
    contraction, with split-precision error scaling with the CENTERED
    residual.
    """
    kd = a_aug.shape[0]
    K = kd // dim
    tn = x.shape[1]
    xc = x if c is None else x - c
    x_aug = jnp.concatenate(
        [xc, jnp.full((1, tn), -1.0, dtype=x.dtype)], axis=0)
    diff = _dot_val(a_aug, x_aug)        # (K*D, TN), already centered
    maha = _block_sum(diff * diff, K, dim, exact=False)   # (K, TN)
    if dof is not None:
        return log_norm - 0.5 * (dof + dim) * jnp.log1p(maha / dof)
    return log_norm - 0.5 * maha


def _weighted_lse(ind, w):
    """Column-wise weighted log-sum-exp of (K, TN) with (K, 1) weights."""
    m = jnp.max(ind, axis=0, keepdims=True)
    s = jnp.sum(w * jnp.exp(ind - m), axis=0, keepdims=True)
    return jnp.log(s) + m  # (1, TN)


def _logq_kernel(x_ref, c_ref, a_ref, ln_ref, w_ref, dof_ref, out_ref, *,
                 dim, student_t):
    dof = dof_ref[:] if student_t else None
    ind = _component_logpdfs_tile(x_ref[:], c_ref[:], a_ref[:], ln_ref[:],
                                  dof, dim)
    out_ref[:] = _weighted_lse(ind, w_ref[:])


def _rho_kernel(x_ref, c_ref, a_ref, ln_ref, w_ref, dof_ref,
                rho_ref, logq_ref, *, dim, student_t):
    dof = dof_ref[:] if student_t else None
    w = w_ref[:]
    ind = _component_logpdfs_tile(x_ref[:], c_ref[:], a_ref[:], ln_ref[:],
                                  dof, dim)
    lse = _weighted_lse(ind, w)
    # reference semantics (pmc.pyx:37-41) computed IN LOG SPACE: the
    # linear form exp(ind)*w/(exp(lse)+tiny) underflows both sides for
    # samples with mixture log-density below ~-87 in float32 (routine at
    # D >= 20), silently dropping them from the statistics; exp(ind-lse)
    # is the same ratio, exact, and needs no tiny (lse is finite whenever
    # any component weight is positive)
    rho = jnp.exp(ind - lse) * w
    rho_ref[:] = jnp.where(w > 0, rho, 0.0)
    logq_ref[:] = lse


def _maha_kernel(x_ref, c_ref, a_ref, out_ref, *, dim):
    kd = a_ref.shape[0]
    K = kd // dim
    tn = x_ref.shape[1]
    x_aug = jnp.concatenate(
        [x_ref[:] - c_ref[:], jnp.full((1, tn), -1.0, dtype=x_ref.dtype)],
        axis=0)
    diff = _dot_val(a_ref[:], x_aug)
    out_ref[:] = _block_sum(diff * diff, K, dim, exact=False)


def _transform_kernel(z_ref, lat_ref, scale_ref, ct_ref, mu_ref, out_ref, *,
                      dim, n_comp):
    z = z_ref[:]                          # (D, TN)
    tn = z.shape[1]
    kd = ct_ref.shape[0]
    y = _dot_val(ct_ref[:], z)            # (K*D, TN); y[k*D+i, n] = (chol_k z_n)[i]
    lat = lat_ref[:]                      # (1, TN) int32
    ks = jax.lax.broadcasted_iota(jnp.int32, (n_comp, tn), 0)
    onehot = (lat == ks).astype(z.dtype)  # (K, TN)
    if _gather_use_matmul():
        # expand the one-hot over each length-D sublane block, mask, then
        # contract the block structure away (no in-kernel reshapes)
        seg = _block_selector(n_comp, kd, dim, z.dtype)   # (K, K*D)
        pos = _pos_selector(dim, kd, z.dtype)             # (D, K*D)
        onehot_exp = _dot01(seg.T, onehot)                # (K*D, TN)
        y_sel = _dot_sel(pos, y * onehot_exp)             # (D, TN)
        mu_sel = _dot_selr(mu_ref[:], onehot)             # (D, K) @ (K, TN)
    else:
        # streamed slab FMAs (see _propose_tile)
        y_sel = mu_sel = None
        for k in range(n_comp):
            yt = y[k * dim:(k + 1) * dim, :] * onehot[k:k + 1, :]
            mt = mu_ref[:, k:k + 1] * onehot[k:k + 1, :]
            y_sel = yt if y_sel is None else y_sel + yt
            mu_sel = mt if mu_sel is None else mu_sel + mt
    out_ref[:] = mu_sel + y_sel * scale_ref[:]


# ------------------------------------------------------------------ #
# in-kernel randomness: hardware PRNG, with an interpret-mode shim     #
# ------------------------------------------------------------------ #
# The Mosaic hardware-PRNG primitives (pltpu.prng_seed /
# prng_random_bits) do not exist in the Pallas interpreter, so without a
# substitute none of the in-kernel-RNG kernels could ever execute in the
# CPU test suite or the multichip dryrun.  In interpret mode the SAME
# kernel bodies draw from a counter-based software generator instead:
# :func:`_seed_rng` stashes the two (traced) seed words plus a
# Python-level draw counter, and each :func:`_kernel_uniform` call hashes
# (seed words, draw index, element index) through three rounds of a
# PCG-style integer permutation.  The draw-call SEQUENCE in a kernel body
# is static, so the counter is ordinary trace-time state; streams are
# deterministic per (seed, tile), decorrelated across draws and lanes,
# and pass the moment/KS checks of the distributional suite.  The
# hardware path is bit-for-bit unchanged.

_sw_rng_state = None  # [s0 (u32), s1 (u32), draw counter] while tracing


def _seed_rng(s0, s1):
    """Seed the per-tile stream: hardware ``pltpu.prng_seed`` on TPU, the
    software counter generator in interpret mode."""
    global _sw_rng_state
    if _interpret():
        _sw_rng_state = [jnp.asarray(s0).astype(jnp.uint32),
                         jnp.asarray(s1).astype(jnp.uint32), 0]
    else:
        pltpu.prng_seed(s0, s1)


def _pcg_permute(x):
    """One round of the PCG output permutation (32-bit)."""
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    x = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x) * jnp.uint32(277803737)
    return (x >> jnp.uint32(22)) ^ x


def _sw_random_bits(shape):
    """(shape) uniform uint32 bits from the software generator; advances
    the draw counter."""
    s0, s1, n = _sw_rng_state
    _sw_rng_state[2] = n + 1
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (rows * jnp.uint32(shape[1]) + cols) * jnp.uint32(0x9E3779B9)
    x = x + jnp.uint32(n) * jnp.uint32(0x85EBCA6B)
    x = _pcg_permute(x ^ s0)
    x = _pcg_permute(x ^ s1)
    return _pcg_permute(x)


def _kernel_uniform(shape, offset=0):
    """Uniform draws from the per-core hardware PRNG (or the interpret-mode
    software generator); in (0, 1] when ``offset=1`` (safe for log), in
    [0, 1) when ``offset=0``.  Mosaic has no uint32->f32 cast; the 24-bit
    values are sign-safe as int32."""
    if _interpret():
        i = ((_sw_random_bits(shape) >> jnp.uint32(8)).astype(jnp.int32)
             + offset)
        return i.astype(jnp.float32) * (1.0 / (1 << 24))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i = pltpu.bitcast((bits >> 8) + offset, jnp.int32)
    return i.astype(jnp.float32) * (1.0 / (1 << 24))


# Degree-5 near-minimax (Chebyshev-fit) coefficients in r = t^2 for
# cos((pi/2) t) and sin((pi/2) t) / t on t in [0, 1): max abs error of the
# reconstructed cos/sin(2*pi*u) is <= 2.1e-7 in float32 -- at the f32
# resolution (validated against float64 numpy in tests/test_rng_kernels.py).
_COS_HALF_PI_COEF = (9.9999999985e-01, -1.2337005381e+00, 2.5366935701e-01,
                     -2.0862795046e-02, 9.1785861521e-04, -2.3883017861e-05)
_SIN_HALF_PI_COEF = (1.5707963268e+00, -6.4596409604e-01, 7.9692607918e-02,
                     -4.6816708701e-03, 1.6027107797e-04, -3.4389421972e-06)


def _horner(coef, r):
    acc = jnp.float32(coef[-1])
    for c in coef[-2::-1]:
        acc = acc * r + jnp.float32(c)
    return acc


def _sincos_2pi(u):
    """``(cos(2 pi u), sin(2 pi u))`` for uniform ``u`` in [0, 1) via exact
    quadrant folding + two degree-5 polynomials (<= 2.1e-7 abs error).

    Why not ``jnp.cos``/``jnp.sin``: the VPU's exp/log/sqrt are
    hardware-cheap (~0 extra lane-ops over a mul -- measured,
    ``benchmarks/vpu_microbench.py``), but sin/cos cost ~25 lane-ops each;
    for a UNIFORM angle the range reduction is a trivial exact fold, so
    the polynomial pair removes the two costliest ops of the Box-Muller
    draw.  Replaces the hot loop the reference runs per proposal draw
    (``/root/reference/pypmc/density/gauss.pyx:50-52``)."""
    t4 = u * 4.0
    q = jnp.floor(t4)
    t = t4 - q
    r = t * t
    c = _horner(_COS_HALF_PI_COEF, r)       # cos((pi/2) t)
    s = t * _horner(_SIN_HALF_PI_COEF, r)   # sin((pi/2) t)
    qi = q.astype(jnp.int32)
    swap = (qi == 1) | (qi == 3)
    cq = jnp.where(swap, s, c)
    sq = jnp.where(swap, c, s)
    cos_v = jnp.where((qi == 1) | (qi == 2), -cq, cq)
    sin_v = jnp.where(qi >= 2, -sq, sq)
    return cos_v, sin_v


def _bm_use_trig():
    """``PYPMC_TPU_NORMAL=trig`` selects the jnp.sin/cos Box-Muller halves
    (kept for A/B measurement); default is the polynomial fold.

    Read at TRACE time: jit caches do not key on the environment, so run
    each variant in a FRESH process -- flipping the variable mid-process
    silently reuses whichever variant was compiled first."""
    import os

    return os.environ.get("PYPMC_TPU_NORMAL") == "trig"


def _gather_use_matmul():
    """``PYPMC_TPU_GATHER=matmul`` selects the selector-matmul one-hot
    gathers / block reductions (kept for A/B measurement); default is the
    streamed slab-FMA / sublane-reduction forms.

    Read at TRACE time: jit caches do not key on the environment, so run
    each variant in a FRESH process (as ``benchmarks/propose_layout_ab.py``
    documents for its own toggle)."""
    import os

    return os.environ.get("PYPMC_TPU_GATHER") == "matmul"


def _kernel_normal_pair(shape):
    """TWO independent standard-normal arrays of ``shape`` from one
    Box-Muller draw (cosine and sine halves) -- half the log/sqrt count of
    drawing twice with only the cosine half.  The circle point comes from
    :func:`_sincos_2pi` (hardware sin/cos are the draw's costliest ops)."""
    u1 = _kernel_uniform(shape, offset=1)
    u2 = _kernel_uniform(shape, offset=0)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    if _bm_use_trig():
        theta = (2.0 * jnp.pi) * u2
        return r * jnp.cos(theta), r * jnp.sin(theta)
    c, s = _sincos_2pi(u2)
    return r * c, r * s


def _kernel_normal_rows(rows, tn):
    """(rows, tn) standard normals, generated pairwise."""
    half = (rows + 1) // 2
    a, b = _kernel_normal_pair((half, tn))
    z = jnp.concatenate([a, b], axis=0)
    return z if z.shape[0] == rows else z[:rows]


def _rows8(v):
    """Relayout ``(1, T)`` -> ``(8, T//8)`` via 128-aligned lane slices
    (requires ``T % 1024 == 0``).

    A ``(1, T)`` array occupies vregs with 7 of 8 sublanes masked, so
    elementwise/transcendental work on it runs at 1/8 of VPU throughput;
    the hot per-particle rejection loops below run in this 8-row layout
    instead (the lane order is a pure relabeling -- irrelevant for iid
    draws as long as :func:`_unrows8` restores it)."""
    t8 = v.shape[1] // 8
    return jnp.concatenate([v[:, s * t8:(s + 1) * t8] for s in range(8)], axis=0)


def _unrows8(v8):
    """Inverse of :func:`_rows8`: ``(8, T8)`` -> ``(1, 8*T8)``.

    Mosaic cannot lane-concatenate vectors whose sublane offsets differ
    ("result/input offset mismatch on non-concat dimension"), so each row
    is first brought to sublane 0 with a sublane rotate (``pltpu.roll``)
    and sliced there -- 8 cheap VPU rotates instead of the previous 24
    exact-selector MXU matmuls (3-way bf16 split x 8 rows).  Set
    ``PYPMC_TPU_UNROWS8_MATMUL=1`` to select the matmul variant (kept for
    A/B measurement)."""
    import os

    if os.environ.get("PYPMC_TPU_UNROWS8_MATMUL"):
        v0, v1, v2 = _bf16_split3(v8)
        rows = []
        for s in range(8):
            sel = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == s
                   ).astype(v8.dtype)
            rows.append(_dot01(sel, v0) + _dot01(sel, v1) + _dot01(sel, v2))
        return jnp.concatenate(rows, axis=1)
    rows = []
    for s in range(8):
        r = v8 if s == 0 else pltpu.roll(v8, 8 - s, 0)
        rows.append(r[0:1, :])
    return jnp.concatenate(rows, axis=1)


# Fixed Marsaglia-Tsang rounds for the in-kernel chi-square draw.
#
# Bound: with the log-space shape boost the Gamma shape actually sampled is
# d = a + 1 - 1/3 = a + 2/3 for ANY a = dof/2 > 0, and the Marsaglia-Tsang
# squeeze-free acceptance probability is an increasing function of d with
# value 0.951 at its global minimum d = 2/3 (Marsaglia & Tsang 2000, sec. 3
# -- their worst case alpha = 1, and the boost pins us at or above it even
# as dof -> mindof).  The per-element probability of exhausting R rounds is
# therefore <= 0.049^R; at R = 6 that is <= 1.4e-8.  An exhausted element
# falls back to the distribution's near-mode central value g = d -- not an
# invalid sample -- so the induced bias on any moment is <= 1.4e-8 x O(1),
# an order below float32 resolution (1.2e-7) and ~4 orders below the
# Monte-Carlo error of a 1e7-particle estimate.  Halving the rounds from 12
# removes ~half of the transcendental work in the Student-t proposal's
# hottest loop (measured delta in BENCHMARKS.md).
_MT_ROUNDS = 6


def _kernel_log_chi2(dof):
    """Log of chi-square draws with per-element degrees of freedom, drawn
    with the hardware PRNG via Marsaglia-Tsang with the log-space shape
    boost (exact; see ops.random.chi2_log for the algorithm).

    Call with the ``(8, T/8)`` :func:`_rows8` layout: this loop is the
    transcendental-heaviest part of the Student-t proposal, and on a
    ``(1, T)`` operand it would waste 7/8 of the VPU sublanes."""
    a = 0.5 * dof
    d = a + 1.0 - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    done = jnp.zeros(dof.shape, dtype=jnp.bool_)
    log_g = jnp.log(d)  # central fallback; overwritten on first accept
    z_next = None
    for r in range(_MT_ROUNDS):
        if r % 2 == 0:
            z, z_next = _kernel_normal_pair(dof.shape)
        else:
            z = z_next
        u = _kernel_uniform(dof.shape, offset=1)
        one_plus_cz = 1.0 + c * z
        ok_v = one_plus_cz > 0
        safe = jnp.where(ok_v, one_plus_cz, 1.0)
        v = safe * safe * safe
        log_v = 3.0 * jnp.log(safe)
        accept = ok_v & (jnp.log(u) < 0.5 * z * z + d - d * v + d * log_v)
        newly = accept & ~done
        log_g = jnp.where(newly, jnp.log(d) + log_v, log_g)
        done = done | accept

    u_boost = _kernel_uniform(dof.shape, offset=1)
    return jnp.log(2.0) + log_g + jnp.log(u_boost) / a


def _propose_tile(onehot, scale, ct_ref, mu_ref, dof_ref, *,
                  dim, n_comp, tn, student_t):
    """Shared propose body: in-kernel RNG mixture draw of one (D, TN) tile
    from a precomputed component one-hot ``(K, TN)``.

    ALL randomness beyond the component choice is generated IN-KERNEL from
    the TPU hardware PRNG (the caller must have seeded it): the standard
    normals (paired Box-Muller) and, for Student-t, the per-particle
    chi-square scale (Marsaglia-Tsang in the 8-row :func:`_rows8` layout)
    -- no (D, N) normal array and no chi-square rejection pass ever touch
    the host RNG path or HBM."""
    kd = ct_ref.shape[0]
    z = _kernel_normal_rows(dim, tn)

    y = _dot_val(ct_ref[:], z)
    if _gather_use_matmul():
        seg = _block_selector(n_comp, kd, dim, jnp.float32)
        pos = _pos_selector(dim, kd, jnp.float32)
        onehot_exp = _dot01(seg.T, onehot)
        y_sel = _dot_sel(pos, y * onehot_exp)
    else:
        # stream the K component blocks against the broadcast one-hot rows
        # (exact f32 FMA): the selector-matmul form above pays a 3-way
        # bf16 split of the (K*D, TN) value operand -- ~5 VPU lane-ops per
        # row -- where this is K slab FMAs (~K*D lane-ops, 2-5x less at
        # the flagship K=10, D=10; measured in BENCHMARKS.md round 5)
        y_sel = None
        for k in range(n_comp):
            term = y[k * dim:(k + 1) * dim, :] * onehot[k:k + 1, :]
            y_sel = term if y_sel is None else y_sel + term
    if _gather_use_matmul():
        mu_sel = _dot_selr(mu_ref[:], onehot)
    else:
        # ditto for the mean gather: K broadcast FMAs instead of a 3-pass
        # split matmul (each pass streams the full tile through the MXU)
        mu_sel = None
        for k in range(n_comp):
            term = mu_ref[:, k:k + 1] * onehot[k:k + 1, :]
            mu_sel = term if mu_sel is None else mu_sel + term
    if student_t:
        # per-lane dof via one-hot contraction, then the in-kernel chi2 in
        # the full-sublane-utilization layout; scale = sqrt(dof / chi2)
        if _gather_use_matmul():
            dof_sel = _dot_selr(dof_ref[:], onehot)  # (1, K) @ (K, TN)
        elif n_comp == 1:
            # a (1,1) x (1,TN) broadcast multiply aborts the Mosaic
            # compiler; a scalar fill (the MCMC pool's pattern) compiles
            dof_sel = jnp.full((1, tn), dof_ref[0, 0], jnp.float32)
        else:
            dof_sel = None
            for k in range(n_comp):
                term = dof_ref[:, k:k + 1] * onehot[k:k + 1, :]
                dof_sel = term if dof_sel is None else dof_sel + term
        dof8 = _rows8(dof_sel)
        log_chi2 = _kernel_log_chi2(dof8)
        scale8 = jnp.exp(0.5 * (jnp.log(dof8) - log_chi2))
        scale = _unrows8(scale8)
    if scale is None:
        return mu_sel + y_sel
    return mu_sel + y_sel * scale


def _onehot_from_latent(lat, n_comp, tn):
    ks = jax.lax.broadcasted_iota(jnp.int32, (n_comp, tn), 0)
    return (lat == ks).astype(jnp.float32)


def _seed2(seed):
    """Normalize a seed to TWO int32 words (zero-extended if one was given):
    64 seed bits make cross-step hardware-PRNG stream collisions ~2^-64
    instead of the 32-bit birthday bound of ~n^2/2^33."""
    seed = jnp.atleast_1d(jnp.asarray(seed, dtype=jnp.int32))
    if seed.shape[0] < 2:
        seed = jnp.concatenate(
            [seed, jnp.zeros((2 - seed.shape[0],), jnp.int32)])
    return seed[:2]


def _transform_rng_kernel(seed_ref, lat_ref, scale_ref, ct_ref, mu_ref,
                          dof_ref, out_ref, *, dim, n_comp, student_t):
    """In-kernel-RNG mixture proposal transform (see :func:`_propose_tile`).
    Each grid step reseeds with 64 bits (two 32-bit words from the jax key;
    Mosaic accepts at most two seed values, so the program id is folded
    into the second word) -- tiles draw independent streams, cross-step
    seed collisions are ~2^-64, and results are deterministic for a fixed
    seed and tile size."""
    tn = out_ref.shape[1]
    _seed_rng(seed_ref[0], seed_ref[1] + pl.program_id(0))
    onehot = _onehot_from_latent(lat_ref[:], n_comp, tn)
    scale = None if student_t else scale_ref[:]
    out_ref[:] = _propose_tile(
        onehot, scale, ct_ref, mu_ref, dof_ref,
        dim=dim, n_comp=n_comp, tn=tn, student_t=student_t)


def _propose_logq_kernel(seed_ref, cumw_ref, ct_ref, mu_ref,
                         dof_ref, c_ref, a_ref, ln_ref, w_ref, dofc_ref,
                         *refs, dim, n_comp, student_t, t_student_t,
                         has_target, centered=True):
    """Fused propose -> proposal log-q [-> mixture-target log-p] kernel.

    The component choice is ALSO drawn in-kernel: one hardware-PRNG uniform
    per particle against the cumulative weights ``cumw (K, 1)`` (the
    inverse-CDF draw; replaces an XLA threefry pass over all N particles).
    The freshly drawn (D, TN) sample tile is then evaluated against the
    proposal mixture (and optionally a second, target mixture) while still
    resident in VMEM -- the evaluation passes never re-read the samples
    from HBM, and the whole importance-sampling step becomes one kernel."""
    if has_target:
        tc_ref, ta_ref, tln_ref, tw_ref, tdof_ref = refs[:5]
        out_ref, lat_ref, logq_ref, logp_ref = refs[5:]
    else:
        out_ref, lat_ref, logq_ref = refs
    tn = out_ref.shape[1]
    # 64-bit reseed per tile (Mosaic caps prng_seed at two values, so the
    # program id is folded into the second word -- distinct per tile for a
    # fixed key, ~2^-64 collision odds across steps)
    _seed_rng(seed_ref[0], seed_ref[1] + pl.program_id(0))
    # inverse-CDF categorical: latent = sum_{k<K-1} [u >= cumw_k]; dead
    # components (weight 0) have an empty interval and are never drawn
    u = _kernel_uniform((1, tn), offset=0)
    cmp = (u >= cumw_ref[:]).astype(jnp.float32)          # (K, TN)
    if _gather_use_matmul():
        ks = jax.lax.broadcasted_iota(jnp.int32, (n_comp, 1), 0)
        mask = (ks < n_comp - 1).astype(jnp.float32).reshape(1, n_comp)
        lat_f = _dot01(mask, cmp)                         # (1, TN)
    elif n_comp == 1:
        # K=1: no thresholds to sum (a 0-row slice is not a valid Mosaic
        # vector even though the interpreter accepts it)
        lat_f = jnp.zeros((1, tn), jnp.float32)
    else:
        # plain sublane reduction over the first K-1 comparison rows --
        # one fewer full-tile MXU pass than the masked matmul
        lat_f = jnp.sum(cmp[:n_comp - 1, :], axis=0, keepdims=True)
    lat = lat_f.astype(jnp.int32)
    lat_ref[:] = lat
    onehot = _onehot_from_latent(lat, n_comp, tn)
    x = _propose_tile(
        onehot, None, ct_ref, mu_ref, dof_ref,
        dim=dim, n_comp=n_comp, tn=tn, student_t=student_t)
    out_ref[:] = x
    dofc = dofc_ref[:] if student_t else None
    ind = _component_logpdfs_tile(x, c_ref[:] if centered else None,
                                  a_ref[:], ln_ref[:], dofc, dim)
    logq_ref[:] = _weighted_lse(ind, w_ref[:])
    if has_target:
        tdof = tdof_ref[:] if t_student_t else None
        t_ind = _component_logpdfs_tile(x, tc_ref[:] if centered else None,
                                        ta_ref[:], tln_ref[:], tdof, dim)
        logp_ref[:] = _weighted_lse(t_ind, tw_ref[:])


def _small_specs(shapes):
    """Block specs for small replicated (non-tiled) operands."""
    return [
        pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]


def _lane_spec(rows, tile):
    return pl.BlockSpec((rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_logq(xT, a2, b2, log_norm, weights, dof, center=None, *, dim):
    """Mixture log-density ``(N,)`` for transposed points ``xT (D, N)``.

    :param a2: ``(K*D, D)`` with ``a2[k*D+i, d] = U_k[i, d]`` (U = inverse
        Cholesky factor of the k-th covariance; ``inv_chol.reshape(K*D, D)``).
    :param b2: ``(K*D, 1)`` projected means ``b2[k*D+i, 0] = (U_k mu_k)[i]``.
    :param log_norm: ``(K, 1)`` per-component log-normalizations.
    :param weights: ``(K, 1)`` linear component weights (0 = dead).
    :param dof: ``(K, 1)`` degrees of freedom, or None for Gaussian.
    :param center: ``(D,)`` coordinate center (e.g. the mixture's weighted
        mean) subtracted in-kernel so the split-precision matmul error is
        translation-invariant; None = origin.
    """
    kd = a2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim, QUANTUM_EVAL)
    xT, n_orig = _pad_lanes(xT, tile)
    grid = xT.shape[1] // tile
    student_t = dof is not None
    if dof is None:
        dof = jnp.zeros((K, 1), dtype=xT.dtype)
    c = _center_or_zero(center, dim, xT.dtype)

    out = pl.pallas_call(
        functools.partial(_logq_kernel, dim=dim, student_t=student_t),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            *_small_specs([(dim, 1), (kd, dim + 1), (K, 1), (K, 1), (K, 1)]),
        ],
        out_specs=_lane_spec(1, tile),
        out_shape=jax.ShapeDtypeStruct((1, xT.shape[1]), xT.dtype),
        interpret=_interpret(),
    )(xT, c, _aug_eval_operand(a2, b2, center), log_norm, weights, dof)
    return out[0, :n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_rho(xT, a2, b2, log_norm, weights, dof, center=None, *, dim):
    """Rao-Blackwellized responsibilities ``rho (K, N)`` and mixture
    log-density ``(N,)`` in one fused pass (arguments as
    :func:`fused_logq`)."""
    kd = a2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim, QUANTUM_EVAL)
    xT, n_orig = _pad_lanes(xT, tile)
    grid = xT.shape[1] // tile
    student_t = dof is not None
    if dof is None:
        dof = jnp.zeros((K, 1), dtype=xT.dtype)
    c = _center_or_zero(center, dim, xT.dtype)

    rho, logq = pl.pallas_call(
        functools.partial(_rho_kernel, dim=dim, student_t=student_t),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            *_small_specs([(dim, 1), (kd, dim + 1), (K, 1), (K, 1), (K, 1)]),
        ],
        out_specs=[_lane_spec(K, tile), _lane_spec(1, tile)],
        out_shape=[
            jax.ShapeDtypeStruct((K, xT.shape[1]), xT.dtype),
            jax.ShapeDtypeStruct((1, xT.shape[1]), xT.dtype),
        ],
        interpret=_interpret(),
    )(xT, c, _aug_eval_operand(a2, b2, center), log_norm, weights, dof)
    return rho[:, :n_orig], logq[0, :n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_maha(xT, a2, b2, center=None, *, dim):
    """``(K, N)`` squared Mahalanobis distances (arguments as
    :func:`fused_logq`)."""
    kd = a2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim, QUANTUM_EVAL)
    xT, n_orig = _pad_lanes(xT, tile)
    grid = xT.shape[1] // tile
    c = _center_or_zero(center, dim, xT.dtype)

    out = pl.pallas_call(
        functools.partial(_maha_kernel, dim=dim),
        grid=(grid,),
        in_specs=[_lane_spec(dim, tile),
                  *_small_specs([(dim, 1), (kd, dim + 1)])],
        out_specs=_lane_spec(K, tile),
        out_shape=jax.ShapeDtypeStruct((K, xT.shape[1]), xT.dtype),
        interpret=_interpret(),
    )(xT, c, _aug_eval_operand(a2, b2, center))
    return out[:, :n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_transform_rng(seed, latent, scale, ct2, mu2, dof=None, *, dim):
    """Mixture affine transform with IN-KERNEL randomness:
    ``out[:, n] = mu[latent[n]] + (chol[latent[n]] @ z_n) * scale_n`` where
    ``z_n`` are Box-Muller normals from the TPU hardware PRNG and, when
    ``dof (1, K)`` is given (Student-t), ``scale_n = sqrt(dof_n / chi2_n)``
    with the chi-square ALSO drawn in-kernel (Marsaglia-Tsang; the ``scale``
    argument is then ignored).

    :param seed: int32 seed, scalar or ``(2,)`` (derive TWO words from a jax
        key; a single word is zero-extended).
    :param latent, scale, ct2, mu2: as :func:`fused_transform`.
    :param dof: ``(1, K)`` degrees of freedom, or None for Gaussian.
    """
    kd = ct2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim, QUANTUM_RNG)
    n = latent.shape[0]
    lat2, n_orig = _pad_lanes(latent[None, :].astype(jnp.int32), tile)
    scale2, _ = _pad_lanes(scale[None, :], tile)
    grid = lat2.shape[1] // tile
    seed = _seed2(seed)
    student_t = dof is not None
    if dof is None:
        dof = jnp.ones((1, K), dtype=scale.dtype)

    out = pl.pallas_call(
        functools.partial(_transform_rng_kernel, dim=dim, n_comp=K,
                          student_t=student_t),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _lane_spec(1, tile),
            _lane_spec(1, tile),
            *_small_specs([(kd, dim), (dim, K), (1, K)]),
        ],
        out_specs=_lane_spec(dim, tile),
        out_shape=jax.ShapeDtypeStruct((dim, lat2.shape[1]), scale.dtype),
        interpret=_interpret(),
    )(seed, lat2, scale2, ct2, mu2, dof)
    return out[:, :n_orig]


@functools.partial(jax.jit, static_argnames=("n", "dim", "centered"))
def fused_propose_logq(seed, cumw, ct2, mu2, dof_row,
                       a2, b2, log_norm, weights, dof_col, center=None,
                       target=None, *, n, dim, centered=True):
    """ONE kernel for the whole importance-sampling hot path: draw the
    per-particle component (inverse-CDF on the hardware PRNG), draw the
    mixture proposal tile (see :func:`fused_transform_rng`), evaluate the
    proposal log-density on it while it is still VMEM-resident, and
    optionally evaluate a second (mixture) target density -- the samples
    are written to HBM exactly once and never re-read, and no XLA-side
    threefry pass over N is needed at all.

    :param seed: int32 seed, scalar or ``(2,)`` (derive TWO words from a jax
        key; a single word is zero-extended).
    :param cumw: ``(K, 1)`` cumulative component weights.
    :param ct2, mu2: transform operands as :func:`fused_transform`.
    :param dof_row: ``(1, K)`` proposal dofs or None (Gaussian).
    :param a2, b2, log_norm, weights, dof_col: proposal evaluation operands
        as :func:`fused_logq` (``dof_col`` is ``(K, 1)`` or None).
    :param center: ``(D,)`` evaluation center for the proposal mixture
        (see :func:`fused_logq`), or None.
    :param target: None, or a tuple ``(ta2, tb2, tlog_norm, tweights,
        tdof_col, tcenter)`` of the same evaluation operands for a target
        mixture over the same dimension (``tdof_col`` None for a Gaussian
        target, ``tcenter`` the target's own evaluation center or None).
    :param n: number of particles to draw (static).
    :returns: ``(samples_T (D, n), latent (n,) int32, log_q (n,))`` and
        additionally ``log_p (n,)`` when ``target`` is given.
    """
    kd = ct2.shape[0]
    K = kd // dim
    kt = 0 if target is None else target[0].shape[0] // dim
    tile = pick_tile(K + kt, dim, QUANTUM_RNG)
    n_pad = (n + tile - 1) // tile * tile
    grid = n_pad // tile
    seed = _seed2(seed)
    dtype = ct2.dtype
    student_t = dof_row is not None
    if dof_row is None:
        dof_row = jnp.ones((1, K), dtype=dtype)
        dof_col = jnp.ones((K, 1), dtype=dtype)

    if not centered:
        center = None
    operands = [seed, cumw, ct2, mu2, dof_row,
                _center_or_zero(center, dim, dtype),
                _aug_eval_operand(a2, b2, center), log_norm, weights, dof_col]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *_small_specs([(K, 1), (kd, dim), (dim, K), (1, K), (dim, 1),
                       (kd, dim + 1), (K, 1), (K, 1), (K, 1)]),
    ]
    out_specs = [_lane_spec(dim, tile), _lane_spec(1, tile),
                 _lane_spec(1, tile)]
    out_shape = [jax.ShapeDtypeStruct((dim, n_pad), dtype),
                 jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
                 jax.ShapeDtypeStruct((1, n_pad), dtype)]
    has_target = target is not None
    t_student_t = False
    if has_target:
        ta2, tb2, tln, tw, tdof, tcenter = target
        if not centered:
            tcenter = None
        t_student_t = tdof is not None
        if tdof is None:
            tdof = jnp.ones((kt, 1), dtype=dtype)
        operands += [_center_or_zero(tcenter, dim, dtype),
                     _aug_eval_operand(ta2, tb2, tcenter), tln, tw, tdof]
        in_specs += _small_specs([(dim, 1), (kt * dim, dim + 1),
                                  (kt, 1), (kt, 1), (kt, 1)])
        out_specs.append(_lane_spec(1, tile))
        out_shape.append(jax.ShapeDtypeStruct((1, n_pad), dtype))

    outs = pl.pallas_call(
        functools.partial(_propose_logq_kernel, dim=dim, n_comp=K,
                          student_t=student_t, t_student_t=t_student_t,
                          has_target=has_target, centered=centered),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*operands)
    if has_target:
        x, lat, logq, logp = outs
        return x[:, :n], lat[0, :n], logq[0, :n], logp[0, :n]
    x, lat, logq = outs
    return x[:, :n], lat[0, :n], logq[0, :n]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_transform(zT, latent, scale, ct2, mu2, *, dim):
    """Per-particle mixture affine transform (transposed layout):
    ``out[:, n] = mu[latent[n]] + (chol[latent[n]] @ z[:, n]) * scale[n]``.

    :param zT: ``(D, N)`` standard normals.
    :param latent: ``(N,)`` int32 component indices.
    :param scale: ``(N,)`` per-particle scale (1 for Gaussian,
        ``sqrt(dof/chi2)`` for Student-t).
    :param ct2: ``(K*D, D)`` with ``ct2[k*D+i, d] = chol_k[i, d]``
        (``chol.reshape(K*D, D)``).
    :param mu2: ``(D, K)`` component means, transposed.
    """
    kd = ct2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim, QUANTUM_EVAL)
    zT, n_orig = _pad_lanes(zT, tile)
    lat2, _ = _pad_lanes(latent[None, :].astype(jnp.int32), tile)
    scale2, _ = _pad_lanes(scale[None, :], tile)
    grid = zT.shape[1] // tile

    out = pl.pallas_call(
        functools.partial(_transform_kernel, dim=dim, n_comp=K),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            _lane_spec(1, tile),
            _lane_spec(1, tile),
            *_small_specs([(kd, dim), (dim, K)]),
        ],
        out_specs=_lane_spec(dim, tile),
        out_shape=jax.ShapeDtypeStruct((dim, zT.shape[1]), zT.dtype),
        interpret=_interpret(),
    )(zT, lat2, scale2, ct2, mu2)
    return out[:, :n_orig]


# ------------------------------------------------------------------ #
# Fused PMC sufficient statistics                                     #
# ------------------------------------------------------------------ #

def _dotT_highest(x, y):
    """``x @ y.T`` (contraction over the LANE/particle axis of both
    operands, no in-kernel transpose) at FULL float32 precision.

    The sufficient-statistics Gram matrix needs it: its entries carry
    ``|mu_new - mu_old|^2``-scale values that later cancel against the
    mean-shift term, so a 2^-16 split error would be amplified by
    ``d^2/sigma^2`` (measured 0.37 relative on the covariance for a
    deliberately mis-centered mixture)."""
    return jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _pmc_stats_kernel(x_ref, w_ref, a_ref, ln_ref, wk_ref, dofc_ref, psi_ref,
                      s0_ref, s0c_ref, sd_ref, g_ref, sw_ref, t1_ref, *,
                      dim, student_t, dof_stats):
    """One pass over a particle tile producing ALL PMC sufficient
    statistics, accumulated in VMEM across grid steps.

    The second-moment sums are computed in WHITENED coordinates: the
    evaluation's centered projection ``diff = U_k (x - mu_k)`` (stacked
    ``(K*D, TN)``) gives ``G = (c * diff) @ diff^T`` whose K diagonal
    ``(D, D)`` blocks are ``U_k S_k U_k^T``; the caller recovers the raw
    sums as ``L_k G_kk L_k^T`` (exact linear algebra, no extra pass).
    Means come the same way: ``sum_n c (x - mu_k) = L_k sum_n c*diff_k``.
    Neither rho, gamma, nor any per-particle array ever reaches HBM.

    Reference semantics: ``mix_adapt/pmc.pyx:23-43`` (rho), ``:601-610``
    (gamma pass), ``:181-224``/``:612-650`` (statistics), ``:652-683``
    (the dof-condition reduction, accumulated as
    ``t1 = sum_n w rho [log(0.5(b+nu)) - psi(0.5(D+nu)) + gamma]``).
    """
    kd = a_ref.shape[0]
    K = kd // dim
    tn = x_ref.shape[1]

    x_aug = jnp.concatenate(
        [x_ref[:], jnp.full((1, tn), -1.0, dtype=jnp.float32)], axis=0)
    # FULL precision throughout this kernel: rho is exponentially
    # sensitive to the ABSOLUTE Mahalanobis error (a 2^-16 relative maha
    # error is ~1e-3 in log space at maha ~ 100, i.e. ~0.1% on every tail
    # responsibility), and the mean-shift cancellation in the covariance
    # amplifies statistics errors by d^2/sigma^2 (measured 0.37 relative
    # with split-precision inputs on a mis-centered mixture)
    diff = _dot(a_ref[:], x_aug)              # (KD, TN) whitened, centered
    maha = _block_sum(diff * diff, K, dim)    # (K, TN); exact f32
    wk = wk_ref[:]                            # (K, 1) mixture weights
    ln = ln_ref[:]
    if student_t:
        nu = dofc_ref[:]                      # (K, 1)
        ind = ln - 0.5 * (nu + dim) * jnp.log1p(maha / nu)
    else:
        ind = ln - 0.5 * maha
    lse = _weighted_lse(ind, wk)
    rho = jnp.exp(ind - lse) * wk             # log-space: f32-safe ratio
    rho = jnp.where(wk > 0, rho, 0.0)         # (K, TN)

    w = w_ref[:]                              # (1, TN)
    wrho = rho * w
    if student_t:
        gamma = (nu + dim) / (nu + maha)
        c = wrho * gamma
    else:
        c = wrho
    c_exp = _block_expand(c, K, dim)          # (KD, TN), exact
    a_mat = c_exp * diff
    g = _dotT_highest(a_mat, diff)            # (KD, KD)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s0_ref[:] = jnp.zeros_like(s0_ref)
        s0c_ref[:] = jnp.zeros_like(s0c_ref)
        sd_ref[:] = jnp.zeros_like(sd_ref)
        g_ref[:] = jnp.zeros_like(g_ref)
        sw_ref[:] = jnp.zeros_like(sw_ref)
        t1_ref[:] = jnp.zeros_like(t1_ref)

    s0_ref[:] += jnp.sum(wrho, axis=1, keepdims=True)
    s0c_ref[:] += jnp.sum(c, axis=1, keepdims=True)
    sd_ref[:] += jnp.sum(a_mat, axis=1, keepdims=True)
    g_ref[:] += g
    sw_ref[:] += jnp.concatenate(
        [jnp.sum(w, axis=1, keepdims=True),
         jnp.sum(w * w, axis=1, keepdims=True)], axis=0)
    if dof_stats:
        # [HOD12] dof first-order condition, rho-weighted bracket; the
        # (1-rho) bracket is a per-component constant handled by the caller
        brk1 = jnp.log(0.5 * (maha + nu)) - psi_ref[:] + gamma
        t1_ref[:] += jnp.sum(wrho * brk1, axis=1, keepdims=True)
    else:
        t1_ref[:] += jnp.zeros_like(t1_ref)


@functools.partial(jax.jit, static_argnames=("dim", "dof_stats"))
def fused_pmc_stats(xT, w, a2, b2, log_norm, weights, dof_col, psi_c=None, *,
                    dim, dof_stats=False):
    """ALL sufficient statistics of one PMC update in a single fused pass
    over the particles (see :func:`_pmc_stats_kernel`).

    :param xT: ``(D, N)`` transposed particles.
    :param w: ``(N,)`` importance weights (unnormalized).
    :param a2, b2, log_norm, weights, dof_col: evaluation operands of the
        CURRENT mixture as :func:`fused_logq` (``dof_col`` None = Gaussian).
    :param psi_c: ``(K, 1)`` ``digamma(0.5 (D + nu))`` (Student-t with
        ``dof_stats`` only).
    :returns: dict with
        ``s0 (K,)`` = sum w rho,
        ``s0c (K,)`` = sum c  (c = w rho gamma for Student-t, else == s0),
        ``sd (K, D)`` = sum c * U_k (x - mu_k)  (whitened mean shift),
        ``g (K, D, D)`` = diagonal blocks of sum (c diff) diff^T (whitened
        second moments),
        ``sw (2,)`` = [sum w, sum w^2],
        ``t1 (K,)`` = rho-weighted dof-condition bracket (zeros unless
        ``dof_stats``).
    """
    kd = a2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim, QUANTUM_EVAL)
    xT, _ = _pad_lanes(xT, tile)
    w2, _ = _pad_lanes(w[None, :], tile)      # zero padding: no contribution
    grid = xT.shape[1] // tile
    dtype = xT.dtype
    student_t = dof_col is not None
    if dof_col is None:
        dof_col = jnp.ones((K, 1), dtype=dtype)
    if psi_c is None:
        psi_c = jnp.zeros((K, 1), dtype=dtype)

    zero_map = lambda i: (0, 0)
    acc = lambda shape: pl.BlockSpec(shape, zero_map, memory_space=pltpu.VMEM)
    s0, s0c, sd, g, sw, t1 = pl.pallas_call(
        functools.partial(_pmc_stats_kernel, dim=dim, student_t=student_t,
                          dof_stats=dof_stats),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            _lane_spec(1, tile),
            *_small_specs([(kd, dim + 1), (K, 1), (K, 1), (K, 1), (K, 1)]),
        ],
        out_specs=[acc((K, 1)), acc((K, 1)), acc((kd, 1)), acc((kd, kd)),
                   acc((2, 1)), acc((K, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((K, 1), dtype),
            jax.ShapeDtypeStruct((K, 1), dtype),
            jax.ShapeDtypeStruct((kd, 1), dtype),
            jax.ShapeDtypeStruct((kd, kd), dtype),
            jax.ShapeDtypeStruct((2, 1), dtype),
            jax.ShapeDtypeStruct((K, 1), dtype),
        ],
        interpret=_interpret(),
    )(xT, w2, _aug_eval_operand(a2, b2), log_norm, weights, dof_col, psi_c)
    g4 = g.reshape(K, dim, K, dim)
    g_blocks = jax.vmap(lambda k: jax.lax.dynamic_slice(
        g4, (k, 0, k, 0), (1, dim, 1, dim)).reshape(dim, dim)
    )(jnp.arange(K))
    return {
        "s0": s0[:, 0],
        "s0c": s0c[:, 0],
        "sd": sd.reshape(K, dim),
        "g": g_blocks,
        "sw": sw[:, 0],
        "t1": t1[:, 0],
    }


# ------------------------------------------------------------------ #
# Fused one-kernel PMC training step (mixture targets)                 #
# ------------------------------------------------------------------ #

def _is_pmc_kernel(seed_ref, cumw_ref, ct_ref, mu_ref, dof_row_ref,
                   c_ref, a_ref, ln_ref, wk_ref, dofc_ref, psi_ref,
                   tc_ref, ta_ref, tln_ref, tw_ref, tdof_ref,
                   x_ref, lat_ref, w_ref,
                   s0_ref, s0c_ref, sd_ref, g_ref, sw_ref, t1_ref, *,
                   dim, n_comp, student_t, t_student_t, dof_stats,
                   n_orig):
    """The ENTIRE (M-)PMC training step's particle work in one kernel:
    draw the component (inverse-CDF on the hardware PRNG), draw the sample
    tile (in-kernel normals / chi-square), evaluate the proposal log-q and
    the mixture target's log-p on the VMEM-resident tile, form the
    importance weights, the Rao-Blackwellized responsibilities, the
    Student-t gamma pass, and accumulate ALL sufficient statistics --
    samples and weights are written to HBM exactly once and never re-read
    by the adaptation.

    The proposal evaluation runs at FULL float32 precision (shared by
    rho and the statistics -- same sensitivity analysis as
    :func:`_pmc_stats_kernel`); the target evaluation uses the
    split-precision path (it only enters through the weights, like the
    two-pass pipeline).  Padded lanes beyond ``n_orig`` are masked out of
    every accumulator.

    Reference semantics: stack 3.1 + 3.2 of SURVEY.md in one pass
    (``sampler/importance_sampling.py:158-215`` +
    ``mix_adapt/pmc.pyx:23-43,181-224,601-683``).
    """
    tn = x_ref.shape[1]
    _seed_rng(seed_ref[0], seed_ref[1] + pl.program_id(0))

    # ---- propose (as _propose_logq_kernel) --------------------------- #
    u = _kernel_uniform((1, tn), offset=0)
    cmp = (u >= cumw_ref[:]).astype(jnp.float32)
    ks = jax.lax.broadcasted_iota(jnp.int32, (n_comp, 1), 0)
    mask = (ks < n_comp - 1).astype(jnp.float32).reshape(1, n_comp)
    lat = _dot01(mask, cmp).astype(jnp.int32)
    lat_ref[:] = lat
    onehot = _onehot_from_latent(lat, n_comp, tn)
    x = _propose_tile(
        onehot, None, ct_ref, mu_ref, dof_row_ref,
        dim=dim, n_comp=n_comp, tn=tn, student_t=student_t)
    x_ref[:] = x

    # ---- proposal evaluation at FULL precision (rho + statistics) ---- #
    kd = a_ref.shape[0]
    K = kd // dim
    x_aug = jnp.concatenate(
        [x - c_ref[:], jnp.full((1, tn), -1.0, dtype=jnp.float32)], axis=0)
    diff = _dot(a_ref[:], x_aug)              # (KD, TN) whitened, centered
    maha = _block_sum(diff * diff, K, dim)    # (K, TN); exact f32
    wk = wk_ref[:]
    if student_t:
        nu = dofc_ref[:]
        ind = ln_ref[:] - 0.5 * (nu + dim) * jnp.log1p(maha / nu)
    else:
        ind = ln_ref[:] - 0.5 * maha
    lse = _weighted_lse(ind, wk)              # log q
    rho = jnp.exp(ind - lse) * wk             # log-space: f32-safe ratio
    rho = jnp.where(wk > 0, rho, 0.0)

    # ---- target evaluation + importance weights ---------------------- #
    tdof = tdof_ref[:] if t_student_t else None
    t_ind = _component_logpdfs_tile(x, tc_ref[:], ta_ref[:], tln_ref[:],
                                    tdof, dim)
    logp = _weighted_lse(t_ind, tw_ref[:])
    # mask padded lanes: they drew samples (harmless, sliced away) but
    # must contribute NOTHING to the statistics
    gidx = pl.program_id(0) * tn + jax.lax.broadcasted_iota(
        jnp.int32, (1, tn), 1)
    w = jnp.where(gidx < n_orig, jnp.exp(logp - lse), 0.0)
    w_ref[:] = w

    # ---- sufficient statistics (as _pmc_stats_kernel) ---------------- #
    wrho = rho * w
    if student_t:
        gamma = (nu + dim) / (nu + maha)
        c = wrho * gamma
    else:
        c = wrho
    c_exp = _block_expand(c, K, dim)
    a_mat = c_exp * diff
    g = _dotT_highest(a_mat, diff)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s0_ref[:] = jnp.zeros_like(s0_ref)
        s0c_ref[:] = jnp.zeros_like(s0c_ref)
        sd_ref[:] = jnp.zeros_like(sd_ref)
        g_ref[:] = jnp.zeros_like(g_ref)
        sw_ref[:] = jnp.zeros_like(sw_ref)
        t1_ref[:] = jnp.zeros_like(t1_ref)

    s0_ref[:] += jnp.sum(wrho, axis=1, keepdims=True)
    s0c_ref[:] += jnp.sum(c, axis=1, keepdims=True)
    sd_ref[:] += jnp.sum(a_mat, axis=1, keepdims=True)
    g_ref[:] += g
    # weight diagnostics: [sum w, sum w^2, sum w log w] (entropy term for
    # the normalized perplexity; w == 0 lanes contribute exactly 0)
    wlogw = jnp.where(w > 0, w * jnp.log(jnp.where(w > 0, w, 1.0)), 0.0)
    sw_ref[:] += jnp.concatenate(
        [jnp.sum(w, axis=1, keepdims=True),
         jnp.sum(w * w, axis=1, keepdims=True),
         jnp.sum(wlogw, axis=1, keepdims=True)], axis=0)
    if dof_stats:
        brk1 = jnp.log(0.5 * (maha + nu)) - psi_ref[:] + gamma
        t1_ref[:] += jnp.sum(wrho * brk1, axis=1, keepdims=True)
    else:
        t1_ref[:] += jnp.zeros_like(t1_ref)


@functools.partial(jax.jit, static_argnames=("n", "dim", "dof_stats"))
def fused_is_pmc_step(seed, cumw, ct2, mu2, dof_row,
                      a2, b2, log_norm, weights, dof_col, center, psi_c,
                      target, *, n, dim, dof_stats=False):
    """One-kernel importance-sampling + PMC-statistics step (see
    :func:`_is_pmc_kernel`); requires a MIXTURE target.

    :param seed: int32 seed, scalar or ``(2,)``.
    :param cumw, ct2, mu2, dof_row: propose operands as
        :func:`fused_propose_logq`.
    :param a2, b2, log_norm, weights, dof_col, center: proposal evaluation
        operands as :func:`fused_logq` (``dof_col`` None for Gaussian).
    :param psi_c: ``(K, 1)`` ``digamma(0.5 (D + nu))`` (Student-t with
        ``dof_stats`` only), else None.
    :param target: tuple ``(ta2, tb2, tlog_norm, tweights, tdof_col,
        tcenter)`` of evaluation operands for the target mixture.
    :returns: ``(samples_T (D, n), latent (n,), w (n,), stats)`` with
        ``stats`` the dict of :func:`fused_pmc_stats` except that ``sw``
        is ``(3,)`` = [sum w, sum w^2, sum w log w].
    """
    kd = ct2.shape[0]
    K = kd // dim
    kt = target[0].shape[0] // dim
    tile = pick_tile(K + kt, dim, QUANTUM_RNG)
    n_pad = (n + tile - 1) // tile * tile
    grid = n_pad // tile
    seed = _seed2(seed)
    dtype = ct2.dtype
    student_t = dof_row is not None
    if dof_row is None:
        dof_row = jnp.ones((1, K), dtype=dtype)
        dof_col = jnp.ones((K, 1), dtype=dtype)
    if psi_c is None:
        psi_c = jnp.zeros((K, 1), dtype=dtype)
    ta2, tb2, tln, tw, tdof, tcenter = target
    t_student_t = tdof is not None
    if tdof is None:
        tdof = jnp.ones((kt, 1), dtype=dtype)

    zero_map = lambda i: (0, 0)
    acc = lambda shape: pl.BlockSpec(shape, zero_map, memory_space=pltpu.VMEM)
    operands = [
        seed, cumw, ct2, mu2, dof_row,
        _center_or_zero(center, dim, dtype),
        _aug_eval_operand(a2, b2, center), log_norm, weights, dof_col, psi_c,
        _center_or_zero(tcenter, dim, dtype),
        _aug_eval_operand(ta2, tb2, tcenter), tln, tw, tdof,
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *_small_specs([(K, 1), (kd, dim), (dim, K), (1, K),
                       (dim, 1), (kd, dim + 1), (K, 1), (K, 1), (K, 1), (K, 1),
                       (dim, 1), (kt * dim, dim + 1), (kt, 1), (kt, 1),
                       (kt, 1)]),
    ]
    out_specs = [
        _lane_spec(dim, tile), _lane_spec(1, tile), _lane_spec(1, tile),
        acc((K, 1)), acc((K, 1)), acc((kd, 1)), acc((kd, kd)),
        acc((3, 1)), acc((K, 1)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((dim, n_pad), dtype),
        jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        jax.ShapeDtypeStruct((1, n_pad), dtype),
        jax.ShapeDtypeStruct((K, 1), dtype),
        jax.ShapeDtypeStruct((K, 1), dtype),
        jax.ShapeDtypeStruct((kd, 1), dtype),
        jax.ShapeDtypeStruct((kd, kd), dtype),
        jax.ShapeDtypeStruct((3, 1), dtype),
        jax.ShapeDtypeStruct((K, 1), dtype),
    ]
    x, lat, w, s0, s0c, sd, g, sw, t1 = pl.pallas_call(
        functools.partial(_is_pmc_kernel, dim=dim, n_comp=K,
                          student_t=student_t, t_student_t=t_student_t,
                          dof_stats=dof_stats, n_orig=n),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*operands)
    g4 = g.reshape(K, dim, K, dim)
    g_blocks = jax.vmap(lambda k: jax.lax.dynamic_slice(
        g4, (k, 0, k, 0), (1, dim, 1, dim)).reshape(dim, dim)
    )(jnp.arange(K))
    stats = {
        "s0": s0[:, 0],
        "s0c": s0c[:, 0],
        "sd": sd.reshape(K, dim),
        "g": g_blocks,
        "sw": sw[:, 0],
        "t1": t1[:, 0],
    }
    return x[:, :n], lat[0, :n], w[0, :n], stats


# ------------------------------------------------------------------ #
# Fused VB-GMM E-step                                                 #
# ------------------------------------------------------------------ #

def _vb_estep_kernel(x_ref, w_ref, a_ref, c_ref,
                     s0_ref, sd_ref, g_ref, ent_ref, *, dim):
    """One pass over a particle tile producing the VB E-step sufficient
    statistics (Bishop 10.46/10.49, 10.51-10.53), accumulated in VMEM.

    ``a_ref (K*D, D+1)`` stacks ``A_k = sqrt(nu_k) chol(W_k)^T`` with the
    projected means appended (:func:`_aug_eval_operand`), so ``diff =
    A_k (x - m_k)`` comes from one matmul and ``|diff|^2 = nu_k (x-m_k)^T
    W_k (x-m_k)`` is exactly the Gauss-exponent quadratic (10.64).
    ``c_ref (K, 1)`` carries the remaining per-component constant
    ``E[ln pi_k] + (E[ln det Lambda_k] - D ln 2pi - D/beta_k)/2`` so the
    softmax argument (10.46) is ``c_k - maha_k/2``.  Second moments are
    accumulated WHITENED (``G_k = A_k Sum_k A_k^T`` diagonal blocks) and
    un-whitened by the caller with triangular solves; the responsibility
    entropy (10.75) is reduced in-kernel to one scalar, so no (N, K)
    array ever reaches HBM.

    Reference semantics: ``mix_adapt/variational.pyx:699-932``.
    """
    kd = a_ref.shape[0]
    K = kd // dim
    tn = x_ref.shape[1]

    x_aug = jnp.concatenate(
        [x_ref[:], jnp.full((1, tn), -1.0, dtype=jnp.float32)], axis=0)
    # FULL precision: same sensitivity analysis as _pmc_stats_kernel
    # (responsibilities exponential in the ABSOLUTE quadratic error, and
    # the S_k mean-shift cancellation amplifies relative errors)
    diff = _dot(a_ref[:], x_aug)              # (KD, TN) whitened, centered
    maha = _block_sum(diff * diff, K, dim)    # (K, TN) = nu (x-m) W (x-m)
    ind = c_ref[:] - 0.5 * maha               # (10.46) log rho
    m = jnp.max(ind, axis=0, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(ind - m), axis=0, keepdims=True)) + m
    logr = ind - lse                          # (10.49), normalized
    r = jnp.exp(logr)

    w = w_ref[:]                              # (1, TN)
    wr = r * w
    c_exp = _block_expand(wr, K, dim)         # (KD, TN), exact
    a_mat = c_exp * diff
    g = _dotT_highest(a_mat, diff)            # (KD, KD)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s0_ref[:] = jnp.zeros_like(s0_ref)
        sd_ref[:] = jnp.zeros_like(sd_ref)
        g_ref[:] = jnp.zeros_like(g_ref)
        ent_ref[:] = jnp.zeros_like(ent_ref)

    s0_ref[:] += jnp.sum(wr, axis=1, keepdims=True)
    sd_ref[:] += jnp.sum(a_mat, axis=1, keepdims=True)
    g_ref[:] += g
    # (10.75): sum_n w_n sum_k r log r  (zero-weight lanes contribute 0)
    ent_ref[:] += jnp.sum(jnp.sum(wr * logr, axis=1, keepdims=True),
                          axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_vb_estep(xT, w, a2, b2, const, *, dim):
    """VB E-step sufficient statistics in a single fused pass
    (see :func:`_vb_estep_kernel`).

    :param xT: ``(D, N)`` transposed data.
    :param w: ``(N,)`` sample weights (normalized to sum N by the caller).
    :param a2: ``(K*D, D)`` stacked ``A_k = sqrt(nu_k) chol(W_k)^T``.
    :param b2: ``(K*D, 1)`` projected means ``A_k m_k``.
    :param const: ``(K, 1)`` per-component softmax constant.
    :returns: ``(N_comp (K,), sd (K, D), g (K, D, D), log_q_Z ())`` with
        ``sd``/``g`` the WHITENED first/second moment sums.
    """
    kd = a2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim, QUANTUM_EVAL)
    xT, _ = _pad_lanes(xT, tile)
    w2, _ = _pad_lanes(w[None, :], tile)      # zero padding: no contribution
    grid = xT.shape[1] // tile
    dtype = xT.dtype

    zero_map = lambda i: (0, 0)
    acc = lambda shape: pl.BlockSpec(shape, zero_map, memory_space=pltpu.VMEM)
    s0, sd, g, ent = pl.pallas_call(
        functools.partial(_vb_estep_kernel, dim=dim),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            _lane_spec(1, tile),
            *_small_specs([(kd, dim + 1), (K, 1)]),
        ],
        out_specs=[acc((K, 1)), acc((kd, 1)), acc((kd, kd)), acc((1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((K, 1), dtype),
            jax.ShapeDtypeStruct((kd, 1), dtype),
            jax.ShapeDtypeStruct((kd, kd), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=_interpret(),
    )(xT, w2, _aug_eval_operand(a2, b2), const)
    g4 = g.reshape(K, dim, K, dim)
    g_blocks = jax.vmap(lambda k: jax.lax.dynamic_slice(
        g4, (k, 0, k, 0), (1, dim, 1, dim)).reshape(dim, dim)
    )(jnp.arange(K))
    return s0[:, 0], sd.reshape(K, dim), g_blocks, ent[0, 0]


# ------------------------------------------------------------------ #
# K-blocked kernels (large K*D)                                       #
#                                                                      #
# The kernels above accumulate a dense (K*D, K*D) Gram matrix in VMEM  #
# and keep the whole (K*D, TN) whitened projection live, which caps    #
# them at K*D ~ 128.  The reference's mixture-reduction workloads run  #
# far past that (K=400 mixtures from ``patch_data``,                   #
# ``examples/mixture_reduction.py:34-42``), so the kernels below block #
# the COMPONENT axis instead: per particle tile they stream over       #
# blocks of ``kb`` components (kb*D ~ 128 sublanes, the MXU quantum),  #
# keep only the per-block (kb, TN) log-densities for a streaming       #
# weighted log-sum-exp, and in a second block pass accumulate          #
# per-block (kb*D, kb*D) Gram PANELS -- total Gram work K*D * kb*D     #
# per lane instead of (K*D)^2, and peak VMEM O(K + kb*D) rows per      #
# lane instead of O(K*D).  The projection matmul runs twice (once per  #
# pass); at kb*D ~ 128 the Gram panels dominate, so the recompute is   #
# noise.  ``kb`` is a multiple of 8 so every in-kernel slice offset    #
# is sublane-aligned.                                                  #
# ------------------------------------------------------------------ #

# finite stand-in for -inf on padded components: exp(x - m) underflows to
# exactly 0 for any real max m, and 0 * _PAD_LOG_NORM stays 0.0 (never NaN)
_PAD_LOG_NORM = -1e38


def block_kb(dim: int) -> int:
    """Component-block size for the K-blocked kernels: a multiple of 8 (so
    every in-kernel sublane slice is aligned) with ``kb*dim`` at or near the
    128-row MXU quantum."""
    if dim > 16:
        return 8
    return 8 * max(1, 16 // dim)


def _kpad_blocked(K: int, dim: int) -> int:
    kb = block_kb(dim)
    return (K + kb - 1) // kb * kb


def _blocked_fixed_bytes(K_pad: int, dim: int, kb: int) -> int:
    """Tile-size-independent VMEM: the stacked projection operand, the
    Gram-panel accumulator, and the small per-component columns."""
    return 4 * (K_pad * dim * (dim + 1) + K_pad * dim * kb * dim
                + 8 * _pad8(K_pad))


def _blocked_bytes_per_lane(K_pad: int, dim: int, kb: int) -> int:
    """Per-particle-lane VMEM: the kept per-block log-density/Mahalanobis
    lists (2 K_pad rows), pass-2 block temporaries, and the point tile."""
    return 4 * (2 * K_pad + 4 * kb + 3 * kb * dim + dim + 4)


def prefer_blocked(K: int, N: int, hbm_budget_bytes: int = 12 * 1024**3) -> bool:
    """Whether the K-blocked single-pass kernels should be preferred over
    the unfused XLA path for an (K-component, N-particle) adaptation.

    The K-blocked kernels exist to avoid materializing the (K, N)
    responsibility matrix in HBM; where that matrix (plus ~3x fusion slack
    for the exp/weighted intermediates) fits comfortably, the XLA einsum
    formulation is actually FASTER at large D (measured: K=64, D=40,
    N=2^23 -- XLA 479.9 ms vs blocked 1116.6 ms, the blocked kernel's
    per-lane Gram-panel work scales as K*D*kb*D) -- so blocked is elected
    only where the XLA path approaches HBM capacity (e.g. the K=400
    mixture-reduction scale: 13.4 GB at N=2^23, OOM)."""
    return 4 * K * N * 3 > hbm_budget_bytes


def fits_vmem_blocked(K: int, D: int, quantum: int = QUANTUM_EVAL,
                      vmem_budget_bytes: int = _VMEM_BUDGET) -> bool:
    """Whether a (K, D) mixture fits the K-BLOCKED kernels' VMEM budget at
    the minimum particle tile.  Callers use the dense kernels for
    ``K*D <= 128``, these for larger mixtures that pass this check, and the
    unfused XLA path beyond."""
    kb = block_kb(D)
    K_pad = _kpad_blocked(K, D)
    if K_pad // kb > 64:  # unrolled-block compile-time guard
        return False
    fixed = _blocked_fixed_bytes(K_pad, D, kb)
    return fixed + _blocked_bytes_per_lane(K_pad, D, kb) * quantum \
        <= vmem_budget_bytes


def pick_tile_blocked(K: int, D: int, quantum: int = QUANTUM_EVAL,
                      vmem_budget_bytes: int = _VMEM_BUDGET) -> int:
    """Particle-tile size for the K-blocked kernels (gate on
    :func:`fits_vmem_blocked` first)."""
    kb = block_kb(D)
    K_pad = _kpad_blocked(K, D)
    avail = vmem_budget_bytes - _blocked_fixed_bytes(K_pad, D, kb)
    tn = avail // max(1, _blocked_bytes_per_lane(K_pad, D, kb))
    tn = max(quantum, min(16384, int(tn)))
    return (tn // quantum) * quantum


def _pad_eval_operands_blocked(dim, a2, b2, log_norm, weights, dof_col,
                               psi_c=None):
    """Pad the per-component evaluation operands to a multiple of the block
    size.  Padded components carry weight 0 and log-norm
    :data:`_PAD_LOG_NORM`, so they contribute EXACTLY zero to the weighted
    LSE, the responsibilities and every statistic."""
    K = a2.shape[0] // dim
    K_pad = _kpad_blocked(K, dim)
    if K_pad == K:
        return K_pad, a2, b2, log_norm, weights, dof_col, psi_c
    p = K_pad - K
    dtype = a2.dtype
    a2 = jnp.pad(a2, ((0, p * dim), (0, 0)))
    b2 = jnp.pad(b2, ((0, p * dim), (0, 0)))
    log_norm = jnp.concatenate(
        [log_norm, jnp.full((p, 1), _PAD_LOG_NORM, dtype)])
    weights = jnp.pad(weights, ((0, p), (0, 0)))
    if dof_col is not None:
        dof_col = jnp.concatenate([dof_col, jnp.ones((p, 1), dtype)])
    if psi_c is not None:
        psi_c = jnp.pad(psi_c, ((0, p), (0, 0)))
    return K_pad, a2, b2, log_norm, weights, dof_col, psi_c


def _blocked_logpdfs(x_aug, a_ref, ln_ref, dof_ref, *, dim, kb, nb,
                     student_t, precise):
    """Per-block component log-densities from the (pre-centered) augmented
    tile ``x_aug (D+1, TN)``: returns lists of ``nb`` per-block ``(kb, TN)``
    Mahalanobis / log-density arrays.  ``precise`` selects full-f32 matmuls
    (needed where responsibilities/statistics are formed) vs the ~2^-16
    split-precision path (enough for importance weights)."""
    kbd = kb * dim
    dot = _dot if precise else _dot_val
    mahas, inds = [], []
    for j in range(nb):
        a_j = a_ref[j * kbd:(j + 1) * kbd, :]
        diff_j = dot(a_j, x_aug)
        maha_j = _block_sum(diff_j * diff_j, kb, dim, exact=precise)
        ln_j = ln_ref[j * kb:(j + 1) * kb, :]
        if student_t:
            nu_j = dof_ref[j * kb:(j + 1) * kb, :]
            ind_j = ln_j - 0.5 * (nu_j + dim) * jnp.log1p(maha_j / nu_j)
        else:
            ind_j = ln_j - 0.5 * maha_j
        mahas.append(maha_j)
        inds.append(ind_j)
    return mahas, inds


def _streaming_weighted_lse(inds, wk_ref, kb):
    """Column-wise weighted log-sum-exp over the per-block log-density list
    (the K-blocked form of :func:`_weighted_lse`)."""
    m = jnp.max(inds[0], axis=0, keepdims=True)
    for ind_j in inds[1:]:
        m = jnp.maximum(m, jnp.max(ind_j, axis=0, keepdims=True))
    s = None
    for j, ind_j in enumerate(inds):
        wk_j = wk_ref[j * kb:(j + 1) * kb, :]
        t = jnp.sum(wk_j * jnp.exp(ind_j - m), axis=0, keepdims=True)
        s = t if s is None else s + t
    return jnp.log(s) + m


def _blocked_stats_pass(x_aug, a_ref, wk_ref, dofc_ref, psi_ref, mahas, inds,
                        lse, w, s0_ref, s0c_ref, sd_ref, gp_ref,
                        t1_ref, *, dim, kb, nb, student_t, dof_stats):
    """Second block pass: responsibilities, (Student-t) gamma, and ALL
    per-block sufficient statistics, accumulated into block-sliced VMEM
    refs.  ``gp_ref (K_pad*D, kb*D)`` stacks the per-block Gram panels;
    the caller extracts the K diagonal (D, D) blocks."""
    kbd = kb * dim
    for j in range(nb):
        wk_j = wk_ref[j * kb:(j + 1) * kb, :]
        rho_j = jnp.where(wk_j > 0, jnp.exp(inds[j] - lse) * wk_j, 0.0)
        wrho_j = rho_j * w
        if student_t:
            nu_j = dofc_ref[j * kb:(j + 1) * kb, :]
            gamma_j = (nu_j + dim) / (nu_j + mahas[j])
            c_j = wrho_j * gamma_j
        else:
            c_j = wrho_j
        a_j = a_ref[j * kbd:(j + 1) * kbd, :]
        diff_j = _dot(a_j, x_aug)           # recompute (cheap vs the panels)
        c_exp_j = _block_expand(c_j, kb, dim)   # (kb*D, TN), exact
        a_mat_j = c_exp_j * diff_j
        s0_ref[j * kb:(j + 1) * kb, :] += jnp.sum(wrho_j, axis=1,
                                                  keepdims=True)
        s0c_ref[j * kb:(j + 1) * kb, :] += jnp.sum(c_j, axis=1, keepdims=True)
        sd_ref[j * kbd:(j + 1) * kbd, :] += jnp.sum(a_mat_j, axis=1,
                                                    keepdims=True)
        gp_ref[j * kbd:(j + 1) * kbd, :] += _dotT_highest(a_mat_j, diff_j)
        if dof_stats:
            brk1_j = (jnp.log(0.5 * (mahas[j] + nu_j))
                      - psi_ref[j * kb:(j + 1) * kb, :] + gamma_j)
            t1_ref[j * kb:(j + 1) * kb, :] += jnp.sum(wrho_j * brk1_j, axis=1,
                                                      keepdims=True)


def _gram_panels_to_blocks(gp, K_pad, dim, kb):
    """Extract the K diagonal (D, D) blocks from the stacked per-block Gram
    panels ``gp (K_pad*D, kb*D)``."""
    gp4 = gp.reshape(K_pad, dim, kb, dim)
    return jax.vmap(lambda r: jax.lax.dynamic_slice(
        gp4, (r, 0, jax.lax.rem(r, kb), 0), (1, dim, 1, dim)
    ).reshape(dim, dim))(jnp.arange(K_pad))


def _pmc_stats_blocked_kernel(x_ref, w_ref, a_ref, ln_ref, wk_ref, dofc_ref,
                              psi_ref, s0_ref, s0c_ref, sd_ref, gp_ref,
                              sw_ref, t1_ref, *, dim, kb, student_t,
                              dof_stats):
    """K-blocked variant of :func:`_pmc_stats_kernel` (same statistics, same
    reference semantics) -- see the section comment for the blocking
    scheme."""
    kd = a_ref.shape[0]
    K = kd // dim
    nb = K // kb
    tn = x_ref.shape[1]

    x_aug = jnp.concatenate(
        [x_ref[:], jnp.full((1, tn), -1.0, dtype=jnp.float32)], axis=0)
    mahas, inds = _blocked_logpdfs(
        x_aug, a_ref, ln_ref, dofc_ref, dim=dim, kb=kb, nb=nb,
        student_t=student_t, precise=True)
    lse = _streaming_weighted_lse(inds, wk_ref, kb)
    w = w_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s0_ref[:] = jnp.zeros_like(s0_ref)
        s0c_ref[:] = jnp.zeros_like(s0c_ref)
        sd_ref[:] = jnp.zeros_like(sd_ref)
        gp_ref[:] = jnp.zeros_like(gp_ref)
        sw_ref[:] = jnp.zeros_like(sw_ref)
        t1_ref[:] = jnp.zeros_like(t1_ref)

    _blocked_stats_pass(
        x_aug, a_ref, wk_ref, dofc_ref, psi_ref, mahas, inds, lse, w,
        s0_ref, s0c_ref, sd_ref, gp_ref, t1_ref,
        dim=dim, kb=kb, nb=nb, student_t=student_t, dof_stats=dof_stats)
    sw_ref[:] += jnp.concatenate(
        [jnp.sum(w, axis=1, keepdims=True),
         jnp.sum(w * w, axis=1, keepdims=True)], axis=0)


@functools.partial(jax.jit, static_argnames=("dim", "dof_stats"))
def fused_pmc_stats_blocked(xT, w, a2, b2, log_norm, weights, dof_col,
                            psi_c=None, *, dim, dof_stats=False):
    """K-blocked :func:`fused_pmc_stats` -- identical arguments and returns,
    but fused for mixtures far past ``K*D = 128`` (gate on
    :func:`fits_vmem_blocked`)."""
    K = a2.shape[0] // dim
    kb = block_kb(dim)
    dtype = xT.dtype
    student_t = dof_col is not None
    K_pad, a2, b2, log_norm, weights, dof_col, psi_c = \
        _pad_eval_operands_blocked(dim, a2, b2, log_norm, weights, dof_col,
                                   psi_c)
    if dof_col is None:
        dof_col = jnp.ones((K_pad, 1), dtype=dtype)
    if psi_c is None:
        psi_c = jnp.zeros((K_pad, 1), dtype=dtype)
    kd = K_pad * dim
    tile = pick_tile_blocked(K, dim, QUANTUM_EVAL)
    xT, _ = _pad_lanes(xT, tile)
    w2, _ = _pad_lanes(w[None, :], tile)      # zero padding: no contribution
    grid = xT.shape[1] // tile

    zero_map = lambda i: (0, 0)
    acc = lambda shape: pl.BlockSpec(shape, zero_map, memory_space=pltpu.VMEM)
    s0, s0c, sd, gp, sw, t1 = pl.pallas_call(
        functools.partial(_pmc_stats_blocked_kernel, dim=dim, kb=kb,
                          student_t=student_t, dof_stats=dof_stats),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            _lane_spec(1, tile),
            *_small_specs([(kd, dim + 1), (K_pad, 1), (K_pad, 1), (K_pad, 1),
                           (K_pad, 1)]),
        ],
        out_specs=[acc((K_pad, 1)), acc((K_pad, 1)), acc((kd, 1)),
                   acc((kd, kb * dim)), acc((2, 1)), acc((K_pad, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((K_pad, 1), dtype),
            jax.ShapeDtypeStruct((K_pad, 1), dtype),
            jax.ShapeDtypeStruct((kd, 1), dtype),
            jax.ShapeDtypeStruct((kd, kb * dim), dtype),
            jax.ShapeDtypeStruct((2, 1), dtype),
            jax.ShapeDtypeStruct((K_pad, 1), dtype),
        ],
        interpret=_interpret(),
    )(xT, w2, _aug_eval_operand(a2, b2), log_norm, weights, dof_col, psi_c)
    g_blocks = _gram_panels_to_blocks(gp, K_pad, dim, kb)
    return {
        "s0": s0[:K, 0],
        "s0c": s0c[:K, 0],
        "sd": sd.reshape(K_pad, dim)[:K],
        "g": g_blocks[:K],
        "sw": sw[:, 0],
        "t1": t1[:K, 0],
    }


def _vb_estep_blocked_kernel(x_ref, w_ref, a_ref, c_ref,
                             s0_ref, sd_ref, gp_ref, ent_ref, *, dim, kb):
    """K-blocked variant of :func:`_vb_estep_kernel` (same statistics)."""
    kd = a_ref.shape[0]
    K = kd // dim
    nb = K // kb
    kbd = kb * dim
    tn = x_ref.shape[1]

    x_aug = jnp.concatenate(
        [x_ref[:], jnp.full((1, tn), -1.0, dtype=jnp.float32)], axis=0)

    inds = []
    for j in range(nb):
        a_j = a_ref[j * kbd:(j + 1) * kbd, :]
        diff_j = _dot(a_j, x_aug)
        maha_j = _block_sum(diff_j * diff_j, kb, dim)
        inds.append(c_ref[j * kb:(j + 1) * kb, :] - 0.5 * maha_j)  # (10.46)
    m = jnp.max(inds[0], axis=0, keepdims=True)
    for ind_j in inds[1:]:
        m = jnp.maximum(m, jnp.max(ind_j, axis=0, keepdims=True))
    s = None
    for ind_j in inds:
        t = jnp.sum(jnp.exp(ind_j - m), axis=0, keepdims=True)
        s = t if s is None else s + t
    lse = jnp.log(s) + m
    w = w_ref[:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        s0_ref[:] = jnp.zeros_like(s0_ref)
        sd_ref[:] = jnp.zeros_like(sd_ref)
        gp_ref[:] = jnp.zeros_like(gp_ref)
        ent_ref[:] = jnp.zeros_like(ent_ref)

    for j in range(nb):
        logr_j = inds[j] - lse                # (10.49), normalized
        r_j = jnp.exp(logr_j)
        wr_j = r_j * w
        a_j = a_ref[j * kbd:(j + 1) * kbd, :]
        diff_j = _dot(a_j, x_aug)
        c_exp_j = _block_expand(wr_j, kb, dim)
        a_mat_j = c_exp_j * diff_j
        s0_ref[j * kb:(j + 1) * kb, :] += jnp.sum(wr_j, axis=1, keepdims=True)
        sd_ref[j * kbd:(j + 1) * kbd, :] += jnp.sum(a_mat_j, axis=1,
                                                    keepdims=True)
        gp_ref[j * kbd:(j + 1) * kbd, :] += _dotT_highest(a_mat_j, diff_j)
        # (10.75): padded components have wr == 0 and finite logr -> 0
        ent_ref[:] += jnp.sum(jnp.sum(wr_j * logr_j, axis=1, keepdims=True),
                              axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_vb_estep_blocked(xT, w, a2, b2, const, *, dim):
    """K-blocked :func:`fused_vb_estep` -- identical arguments and returns,
    fused past ``K*D = 128`` (gate on :func:`fits_vmem_blocked`)."""
    K = a2.shape[0] // dim
    kb = block_kb(dim)
    dtype = xT.dtype
    K_pad, a2, b2, const, _w_unused, _d, _p = _pad_eval_operands_blocked(
        dim, a2, b2, const, jnp.ones((K, 1), dtype), None)
    kd = K_pad * dim
    tile = pick_tile_blocked(K, dim, QUANTUM_EVAL)
    xT, _ = _pad_lanes(xT, tile)
    w2, _ = _pad_lanes(w[None, :], tile)
    grid = xT.shape[1] // tile

    zero_map = lambda i: (0, 0)
    acc = lambda shape: pl.BlockSpec(shape, zero_map, memory_space=pltpu.VMEM)
    s0, sd, gp, ent = pl.pallas_call(
        functools.partial(_vb_estep_blocked_kernel, dim=dim, kb=kb),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            _lane_spec(1, tile),
            *_small_specs([(kd, dim + 1), (K_pad, 1)]),
        ],
        out_specs=[acc((K_pad, 1)), acc((kd, 1)), acc((kd, kb * dim)),
                   acc((1, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((K_pad, 1), dtype),
            jax.ShapeDtypeStruct((kd, 1), dtype),
            jax.ShapeDtypeStruct((kd, kb * dim), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=_interpret(),
    )(xT, w2, _aug_eval_operand(a2, b2), const)
    g_blocks = _gram_panels_to_blocks(gp, K_pad, dim, kb)
    return s0[:K, 0], sd.reshape(K_pad, dim)[:K], g_blocks[:K], ent[0, 0]


def _pad_propose_operands_blocked(dim, cumw, ct2, mu2, dof_row):
    """Pad the propose-side operands to the block multiple: padded
    components get cumulative weight 1 (an empty inverse-CDF interval --
    never drawn), zero transform rows and dof 1."""
    K = cumw.shape[0]
    K_pad = _kpad_blocked(K, dim)
    if K_pad == K:
        return cumw, ct2, mu2, dof_row
    p = K_pad - K
    dtype = ct2.dtype
    cumw = jnp.concatenate([cumw, jnp.ones((p, 1), dtype)])
    ct2 = jnp.pad(ct2, ((0, p * dim), (0, 0)))
    mu2 = jnp.pad(mu2, ((0, 0), (0, p)))
    if dof_row is not None:
        dof_row = jnp.concatenate([dof_row, jnp.ones((1, p), dtype)], axis=1)
    return cumw, ct2, mu2, dof_row


def _is_pmc_blocked_kernel(seed_ref, cumw_ref, ct_ref, mu_ref, dof_row_ref,
                           c_ref, a_ref, ln_ref, wk_ref, dofc_ref, psi_ref,
                           tc_ref, ta_ref, tln_ref, tw_ref, tdof_ref,
                           x_ref, lat_ref, w_ref,
                           s0_ref, s0c_ref, sd_ref, gp_ref, sw_ref, t1_ref, *,
                           dim, kb, student_t, t_student_t, dof_stats,
                           n_orig):
    """K-blocked variant of :func:`_is_pmc_kernel`: the whole (M-)PMC
    training step's particle work in one kernel, fused for mixtures far
    past ``K*D = 128`` (see the K-blocked section comment)."""
    kd = a_ref.shape[0]
    K = kd // dim
    nb = K // kb
    ktd = ta_ref.shape[0]
    KT = ktd // dim
    nbt = KT // kb
    kbd = kb * dim
    tn = x_ref.shape[1]
    _seed_rng(seed_ref[0], seed_ref[1] + pl.program_id(0))

    # ---- propose ------------------------------------------------------ #
    # inverse-CDF categorical; padded components (cumw == 1) are never drawn
    u = _kernel_uniform((1, tn), offset=0)
    cmp = (u >= cumw_ref[:]).astype(jnp.float32)          # (K, TN)
    if _gather_use_matmul():
        ks = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        mask = (ks < K - 1).astype(jnp.float32).reshape(1, K)
        lat = _dot01(mask, cmp).astype(jnp.int32)
    elif K == 1:
        lat = jnp.zeros((1, tn), jnp.int32)
    else:
        lat = jnp.sum(cmp[:K - 1, :], axis=0, keepdims=True
                      ).astype(jnp.int32)
    lat_ref[:] = lat
    onehot = _onehot_from_latent(lat, K, tn)

    z = _kernel_normal_rows(dim, tn)
    if _gather_use_matmul():
        seg = _block_selector(kb, kbd, dim, jnp.float32)
        pos = _pos_selector(dim, kbd, jnp.float32)
    y_sel = None
    for j in range(nb):
        ct_j = ct_ref[j * kbd:(j + 1) * kbd, :]
        y_j = _dot_val(ct_j, z)
        if _gather_use_matmul():
            ohe_j = _dot01(seg.T, onehot[j * kb:(j + 1) * kb, :])
            t = _dot_sel(pos, y_j * ohe_j)
        else:
            # streamed slab FMAs over this block's kb components
            t = None
            for k in range(kb):
                term = (y_j[k * dim:(k + 1) * dim, :]
                        * onehot[j * kb + k:j * kb + k + 1, :])
                t = term if t is None else t + term
        y_sel = t if y_sel is None else y_sel + t
    if _gather_use_matmul():
        mu_sel = _dot_selr(mu_ref[:], onehot)
    else:
        mu_sel = None
        for k in range(K):
            term = mu_ref[:, k:k + 1] * onehot[k:k + 1, :]
            mu_sel = term if mu_sel is None else mu_sel + term
    if student_t:
        if _gather_use_matmul():
            dof_sel = _dot_selr(dof_row_ref[:], onehot)
        elif K == 1:
            dof_sel = jnp.full((1, tn), dof_row_ref[0, 0], jnp.float32)
        else:
            dof_sel = None
            for k in range(K):
                term = dof_row_ref[:, k:k + 1] * onehot[k:k + 1, :]
                dof_sel = term if dof_sel is None else dof_sel + term
        dof8 = _rows8(dof_sel)
        log_chi2 = _kernel_log_chi2(dof8)
        scale8 = jnp.exp(0.5 * (jnp.log(dof8) - log_chi2))
        x = mu_sel + y_sel * _unrows8(scale8)
    else:
        x = mu_sel + y_sel
    x_ref[:] = x

    # ---- proposal evaluation at FULL precision (rho + statistics) ----- #
    x_aug = jnp.concatenate(
        [x - c_ref[:], jnp.full((1, tn), -1.0, dtype=jnp.float32)], axis=0)
    mahas, inds = _blocked_logpdfs(
        x_aug, a_ref, ln_ref, dofc_ref, dim=dim, kb=kb, nb=nb,
        student_t=student_t, precise=True)
    lse = _streaming_weighted_lse(inds, wk_ref, kb)

    # ---- target evaluation (split precision) + importance weights ----- #
    xt_aug = jnp.concatenate(
        [x - tc_ref[:], jnp.full((1, tn), -1.0, dtype=jnp.float32)], axis=0)
    _, t_inds = _blocked_logpdfs(
        xt_aug, ta_ref, tln_ref, tdof_ref, dim=dim, kb=kb, nb=nbt,
        student_t=t_student_t, precise=False)
    logp = _streaming_weighted_lse(t_inds, tw_ref, kb)
    gidx = pl.program_id(0) * tn + jax.lax.broadcasted_iota(
        jnp.int32, (1, tn), 1)
    w = jnp.where(gidx < n_orig, jnp.exp(logp - lse), 0.0)
    w_ref[:] = w

    # ---- sufficient statistics ---------------------------------------- #
    @pl.when(pl.program_id(0) == 0)
    def _init():
        s0_ref[:] = jnp.zeros_like(s0_ref)
        s0c_ref[:] = jnp.zeros_like(s0c_ref)
        sd_ref[:] = jnp.zeros_like(sd_ref)
        gp_ref[:] = jnp.zeros_like(gp_ref)
        sw_ref[:] = jnp.zeros_like(sw_ref)
        t1_ref[:] = jnp.zeros_like(t1_ref)

    _blocked_stats_pass(
        x_aug, a_ref, wk_ref, dofc_ref, psi_ref, mahas, inds, lse, w,
        s0_ref, s0c_ref, sd_ref, gp_ref, t1_ref,
        dim=dim, kb=kb, nb=nb, student_t=student_t, dof_stats=dof_stats)
    wlogw = jnp.where(w > 0, w * jnp.log(jnp.where(w > 0, w, 1.0)), 0.0)
    sw_ref[:] += jnp.concatenate(
        [jnp.sum(w, axis=1, keepdims=True),
         jnp.sum(w * w, axis=1, keepdims=True),
         jnp.sum(wlogw, axis=1, keepdims=True)], axis=0)


@functools.partial(jax.jit, static_argnames=("n", "dim", "dof_stats"))
def fused_is_pmc_step_blocked(seed, cumw, ct2, mu2, dof_row,
                              a2, b2, log_norm, weights, dof_col, center,
                              psi_c, target, *, n, dim, dof_stats=False):
    """K-blocked :func:`fused_is_pmc_step` -- identical arguments and
    returns, fused past ``K*D = 128`` (gate on :func:`fits_vmem_blocked`
    with ``K + K_target`` components at :data:`QUANTUM_RNG`)."""
    K = cumw.shape[0]
    KT = target[0].shape[0] // dim
    kb = block_kb(dim)
    dtype = ct2.dtype
    student_t = dof_row is not None
    if dof_row is None:
        dof_row = jnp.ones((1, K), dtype=dtype)
        dof_col = jnp.ones((K, 1), dtype=dtype)
    cumw, ct2, mu2, dof_row = _pad_propose_operands_blocked(
        dim, cumw, ct2, mu2, dof_row)
    K_pad, a2, b2, log_norm, weights, dof_col, psi_c = \
        _pad_eval_operands_blocked(dim, a2, b2, log_norm, weights, dof_col,
                                   psi_c)
    if psi_c is None:
        psi_c = jnp.zeros((K_pad, 1), dtype=dtype)
    ta2, tb2, tln, tw, tdof, tcenter = target
    t_student_t = tdof is not None
    KT_pad, ta2, tb2, tln, tw, tdof, _ = _pad_eval_operands_blocked(
        dim, ta2, tb2, tln, tw, tdof)
    if tdof is None:
        tdof = jnp.ones((KT_pad, 1), dtype=dtype)
    kd = K_pad * dim
    ktd = KT_pad * dim

    tile = pick_tile_blocked(K + KT, dim, QUANTUM_RNG)
    n_pad = (n + tile - 1) // tile * tile
    grid = n_pad // tile
    seed = _seed2(seed)

    zero_map = lambda i: (0, 0)
    acc = lambda shape: pl.BlockSpec(shape, zero_map, memory_space=pltpu.VMEM)
    operands = [
        seed, cumw, ct2, mu2, dof_row,
        _center_or_zero(center, dim, dtype),
        _aug_eval_operand(a2, b2, center), log_norm, weights, dof_col, psi_c,
        _center_or_zero(tcenter, dim, dtype),
        _aug_eval_operand(ta2, tb2, tcenter), tln, tw, tdof,
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *_small_specs([(K_pad, 1), (kd, dim), (dim, K_pad), (1, K_pad),
                       (dim, 1), (kd, dim + 1), (K_pad, 1), (K_pad, 1),
                       (K_pad, 1), (K_pad, 1),
                       (dim, 1), (ktd, dim + 1), (KT_pad, 1), (KT_pad, 1),
                       (KT_pad, 1)]),
    ]
    out_specs = [
        _lane_spec(dim, tile), _lane_spec(1, tile), _lane_spec(1, tile),
        acc((K_pad, 1)), acc((K_pad, 1)), acc((kd, 1)), acc((kd, kb * dim)),
        acc((3, 1)), acc((K_pad, 1)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((dim, n_pad), dtype),
        jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        jax.ShapeDtypeStruct((1, n_pad), dtype),
        jax.ShapeDtypeStruct((K_pad, 1), dtype),
        jax.ShapeDtypeStruct((K_pad, 1), dtype),
        jax.ShapeDtypeStruct((kd, 1), dtype),
        jax.ShapeDtypeStruct((kd, kb * dim), dtype),
        jax.ShapeDtypeStruct((3, 1), dtype),
        jax.ShapeDtypeStruct((K_pad, 1), dtype),
    ]
    x, lat, w, s0, s0c, sd, gp, sw, t1 = pl.pallas_call(
        functools.partial(_is_pmc_blocked_kernel, dim=dim, kb=kb,
                          student_t=student_t, t_student_t=t_student_t,
                          dof_stats=dof_stats, n_orig=n),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*operands)
    g_blocks = _gram_panels_to_blocks(gp, K_pad, dim, kb)
    stats = {
        "s0": s0[:K, 0],
        "s0c": s0c[:K, 0],
        "sd": sd.reshape(K_pad, dim)[:K],
        "g": g_blocks[:K],
        "sw": sw[:, 0],
        "t1": t1[:K, 0],
    }
    return x[:, :n], lat[0, :n], w[0, :n], stats


# ------------------------------------------------------------------ #
# Fused adaptive-Metropolis chain pool                                 #
# ------------------------------------------------------------------ #

def _mcmc_bytes_per_lane(dim: int, kt: int, sc: int) -> int:
    """Per-chain-lane VMEM cost estimate for the MCMC pool kernel: the
    per-chain Cholesky column slabs (D slabs of (pad8(D), CB)), the target
    evaluation transients, the ``sc``-step output chunk and state rows."""
    return 4 * (dim * _pad8(dim) + 2 * _pad8(kt * (dim + 1))
                + sc * _pad8(dim) + _pad8(kt) + 10 * _pad8(dim) + 16)


def mcmc_step_chunk(n_steps: int, dim: int) -> int:
    """Steps unrolled per grid step of :func:`fused_mcmc_pool` (must divide
    ``n_steps``).  The per-step body is D broadcast-FMAs over (D, CB) plus
    one target evaluation, so the unrolled compile unit stays small up to
    very high D; cap the unroll at ``2048 // D`` statements as a remote-
    compile-service safety margin.  ``PYPMC_TPU_MCMC_SC`` overrides the cap
    (the value is still clamped to a divisor of ``n_steps``) -- directly
    attached hardware compiles far larger chunks than the tunneled Mosaic
    service this default was tuned against."""
    import os

    cap = min(8, max(1, 2048 // max(1, dim)))
    env = os.environ.get("PYPMC_TPU_MCMC_SC")
    if env:
        cap = max(1, int(env))
    return max(s for s in range(1, min(cap, n_steps) + 1) if n_steps % s == 0)


def pick_chain_block(dim: int, kt: int, sc: int, student_t_prop: bool,
                     vmem_budget_bytes: int = _VMEM_BUDGET) -> int:
    """Chain-block (lane) size for :func:`fused_mcmc_pool`: a multiple of
    the RNG quantum (1024) when the proposal is Student-t (the in-kernel
    chi-square runs in the :func:`_rows8` layout), else of the 128-lane
    vreg width.  Gate on :func:`fits_vmem_mcmc` first: the rounding-up to
    the quantum here can otherwise overcommit VMEM."""
    q = QUANTUM_RNG if student_t_prop else QUANTUM_EVAL
    cb = vmem_budget_bytes // max(1, _mcmc_bytes_per_lane(dim, kt, sc))
    cb = max(q, min(8192, int(cb)))
    return (cb // q) * q


def fits_vmem_mcmc(dim: int, kt: int, n_steps: int, student_t_prop: bool,
                   vmem_budget_bytes: int = _VMEM_BUDGET) -> bool:
    """Whether :func:`fused_mcmc_pool` fits the VMEM budget at the minimum
    chain-block for a (D-dim, kt-component-target) pool.  Callers fall back
    to the XLA scan pool when False (the reference's MCMC runs at any D,
    ``sampler/markov_chain.py:100-165`` -- so must we, just not fused)."""
    q = QUANTUM_RNG if student_t_prop else QUANTUM_EVAL
    sc = mcmc_step_chunk(n_steps, dim)
    return _mcmc_bytes_per_lane(dim, kt, sc) * q <= vmem_budget_bytes


def _mcmc_pool_kernel(seed_ref, cholc_ref, dofp_ref,
                      tc_ref, ta_ref, tln_ref, tw_ref, tdof_ref,
                      x0_ref, e0_ref,
                      out_ref, acc_ref, nan_ref, xf_ref, ef_ref, *,
                      dim, sc, student_t_prop, t_student_t):
    """``sc`` adaptive-Metropolis steps of a whole chain block per grid
    step, the chain state never leaving VMEM.

    Chains live on the LANE axis: the current points ``(D, CB)`` and target
    values ``(1, CB)`` are carried in the constant-index output buffers
    ``xf``/``ef`` across the (sequential) step-chunk grid axis, so across
    the entire cycle each chain's state is read and written exactly once in
    HBM.  Per step: standard normals from the hardware PRNG, the per-chain
    proposal ``delta = chol_c @ z_c`` streamed as D rank-1 column updates
    ``delta += cholc[e] * z[e]`` over (D, CB) slabs (the round-4 (D^2, CB)
    selector expansion was compile-hostile past D ~ 24; the streamed form
    compiles and runs at any D the VMEM budget admits, and is EXACT f32
    FMA instead of a 2^-16 split-precision contraction), optional
    Student-t chi-square scale (Marsaglia-Tsang in the 8-row layout), the
    mixture target evaluated on the VMEM-resident proposed tile, and the
    Metropolis accept against an in-kernel uniform.

    Reference semantics: the ``run`` hot loop of
    ``sampler/markov_chain.py:100-165`` with a symmetric proposal, vmapped
    over chains (the reference loops one Python object per chain).
    """
    j = pl.program_id(0)            # chain block (slow axis)
    i = pl.program_id(1)            # step chunk (fast axis, sequential)
    n_i = pl.num_programs(1)
    _seed_rng(seed_ref[0], seed_ref[1] + j * n_i + i)

    @pl.when(i == 0)
    def _init():
        xf_ref[:] = x0_ref[:]
        ef_ref[:] = e0_ref[:]
        acc_ref[:] = jnp.zeros_like(acc_ref)
        nan_ref[:] = jnp.zeros_like(nan_ref)

    cur = xf_ref[:]                 # (D, CB)
    cur_e = ef_ref[:]               # (1, CB)
    acc = acc_ref[:]
    nan_c = nan_ref[:]
    cb = cur.shape[1]
    tdof = tdof_ref[:] if t_student_t else None
    for s in range(sc):
        z = _kernel_normal_rows(dim, cb)             # (D, CB)
        # delta[d, c] = sum_e chol_c[d, e] z[e, c]: stream the D Cholesky
        # COLUMN slabs (each an aligned (D, CB) block of the 3-D ref)
        # against the broadcast z rows -- peak transient is (D, CB)
        delta = cholc_ref[0] * z[0:1, :]
        for e in range(1, dim):
            delta = delta + cholc_ref[e] * z[e:e + 1, :]
        if student_t_prop:
            dof8 = jnp.full((8, cb // 8), dofp_ref[0, 0], jnp.float32)
            log_chi2 = _kernel_log_chi2(dof8)
            scale8 = jnp.exp(0.5 * (jnp.log(dof8) - log_chi2))
            delta = delta * _unrows8(scale8)
        proposed = cur + delta
        t_ind = _component_logpdfs_tile(proposed, tc_ref[:], ta_ref[:],
                                        tln_ref[:], tdof, dim)
        prop_e = _weighted_lse(t_ind, tw_ref[:])     # (1, CB)
        # u in (0, 1]: log_u <= 0, so log_rho >= 0 always accepts --
        # exactly the reference's rho >= 1 shortcut
        log_u = jnp.log(_kernel_uniform((1, cb), offset=1))
        log_rho = prop_e - cur_e
        # NaN proposals are counted and always rejected; the host decides
        # whether that is an error (continue_on_NaN policy, matching
        # MarkovChain.run) or business as usual
        is_nan = jnp.isnan(log_rho)
        accept = (~is_nan) & (log_rho >= log_u)
        cur = jnp.where(accept, proposed, cur)
        cur_e = jnp.where(accept, prop_e, cur_e)
        acc = acc + accept.astype(jnp.float32)
        nan_c = nan_c + is_nan.astype(jnp.float32)
        out_ref[s] = cur
    xf_ref[:] = cur
    ef_ref[:] = cur_e
    acc_ref[:] = acc
    nan_ref[:] = nan_c


@functools.partial(jax.jit, static_argnames=("n_steps", "dim"))
def fused_mcmc_pool(seed, x0T, e0, cholr, dof_prop, target, *, n_steps, dim):
    """Run ``C`` symmetric-proposal Metropolis chains for ``n_steps`` steps
    against a mixture target, entirely in one Pallas kernel (see
    :func:`_mcmc_pool_kernel`).

    :param seed: int32 seed, scalar or ``(2,)``.
    :param x0T: ``(D, C)`` starting points, chains on lanes.
    :param e0: ``(C,)`` target log-density at the starting points.
    :param cholr: ``(D*D, C)`` per-chain proposal Cholesky factors,
        ``cholr[d*D + e, c] = chol_c[d, e]``
        (``chols.transpose(1, 2, 0).reshape(D*D, C)``).
    :param dof_prop: scalar Student-t proposal dof, or None for Gaussian.
    :param target: tuple ``(ta2, tb2, tlog_norm, tweights, tdof_col,
        tcenter)`` of mixture evaluation operands as :func:`fused_logq`.
    :returns: ``(points (n_steps, D, C), accepts (C,), nan_counts (C,),
        xfT (D, C), ef (C,))`` -- every visited point (after-move state per
        step), the per-chain accept counts, the per-chain count of
        NaN-target proposals (always rejected in-kernel; the caller applies
        the ``continue_on_NaN`` policy), and the final state.
    """
    C = x0T.shape[1]
    kt = target[0].shape[0] // dim
    student_t_prop = dof_prop is not None
    # enforce the VMEM precondition HERE, not only in
    # sample_adaptive_chains: pick_chain_block floors the block at the
    # lane quantum, so an unchecked oversized pool would overcommit VMEM
    # and die in an opaque Mosaic allocation failure
    if not fits_vmem_mcmc(dim, kt, n_steps, student_t_prop):
        raise ValueError(
            "fused_mcmc_pool does not fit the VMEM budget at D=%d with a "
            "%d-component target (student_t_prop=%s); use the XLA scan "
            "pool (sample_adaptive_chains falls back automatically)"
            % (dim, kt, student_t_prop))
    # step-chunk dividing n_steps (out chunks must tile evenly); see
    # :func:`mcmc_step_chunk` for the cap and its env override
    sc = mcmc_step_chunk(n_steps, dim)
    cb = pick_chain_block(dim, kt, sc, student_t_prop)
    c_pad = (C + cb - 1) // cb * cb
    dtype = x0T.dtype
    dd = dim * dim

    x0p, _ = _pad_lanes(x0T, cb)
    e0p, _ = _pad_lanes(e0[None, :].astype(dtype), cb)
    # normalize the Cholesky dtype to the chain state's (a float64 operand
    # -- e.g. from numpy scalar promotion on the caller side -- would
    # otherwise poison the f32 kernel through the elementwise FMA stream)
    cholr = cholr.astype(dtype)
    # padded chains run a unit-Cholesky random walk and are sliced away
    eye_r = jnp.eye(dim, dtype=dtype).reshape(dd, 1)
    cholr_p = jnp.concatenate(
        [cholr, jnp.broadcast_to(eye_r, (dd, c_pad - C))], axis=1
    ) if c_pad != C else cholr
    # kernel-side layout: (D, D, C) column slabs, cholc[e][d, c] =
    # chol_c[d, e] -- each slab is an aligned 2-D block the kernel streams
    # as a rank-1 update (no (D^2, CB) operand ever materializes)
    cholc_p = cholr_p.reshape(dim, dim, c_pad).transpose(1, 0, 2)

    ta2, tb2, tln, tw, tdof, tcenter = target
    t_student_t = tdof is not None
    if tdof is None:
        tdof = jnp.ones((kt, 1), dtype=dtype)
    dofp = jnp.full((1, 1), 1.0 if dof_prop is None else dof_prop, dtype)

    grid = (c_pad // cb, n_steps // sc)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda j, i: (0,) * len(shape), memory_space=pltpu.VMEM)
    chain = lambda rows: pl.BlockSpec(
        (rows, cb), lambda j, i: (0, j), memory_space=pltpu.VMEM)

    operands = [
        _seed2(seed), cholc_p, dofp,
        _center_or_zero(tcenter, dim, dtype),
        _aug_eval_operand(ta2, tb2, tcenter), tln, tw, tdof,
        x0p, e0p,
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((dim, dim, cb), lambda j, i: (0, 0, j),
                     memory_space=pltpu.VMEM),
        rep((1, 1)),
        rep((dim, 1)), rep((kt * dim, dim + 1)),
        rep((kt, 1)), rep((kt, 1)), rep((kt, 1)),
        chain(dim), chain(1),
    ]
    out_specs = [
        pl.BlockSpec((sc, dim, cb), lambda j, i: (i, 0, j),
                     memory_space=pltpu.VMEM),
        chain(1), chain(1), chain(dim), chain(1),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_steps, dim, c_pad), dtype),
        jax.ShapeDtypeStruct((1, c_pad), dtype),
        jax.ShapeDtypeStruct((1, c_pad), dtype),
        jax.ShapeDtypeStruct((dim, c_pad), dtype),
        jax.ShapeDtypeStruct((1, c_pad), dtype),
    ]
    points, acc, nan_c, xf, ef = pl.pallas_call(
        functools.partial(_mcmc_pool_kernel, dim=dim, sc=sc,
                          student_t_prop=student_t_prop,
                          t_student_t=t_student_t),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*operands)
    return points[:, :, :C], acc[0, :C], nan_c[0, :C], xf[:, :C], ef[0, :C]
