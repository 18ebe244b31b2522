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

Mosaic does not support lane/sublane-splitting reshapes inside kernels, so
all per-component-block reductions are expressed as tiny 0/1 selector
matmuls.  All matmuls use HIGHEST precision (float32-accurate; the TPU
default bf16 passes cost ~3 decimal digits in the distances).  N is padded
to the lane-tile size internally; K and D are static per compilation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_logq", "fused_rho", "fused_maha", "fused_transform",
           "fused_transform_rng", "pick_tile"]

# set True (e.g. from tests) to run the kernels in the Pallas interpreter --
# lets the kernel logic be verified on the CPU backend
INTERPRET = False


def _pad8(n):
    return (n + 7) // 8 * 8


def pick_tile(K: int, D: int, vmem_budget_bytes: int = 6 * 1024 * 1024) -> int:
    """Particle-tile (lane) size: the per-lane VMEM cost is a handful of
    (pad8(K*D), TN), (pad8(K), TN) and (pad8(D), TN) buffers."""
    bytes_per_lane = 4 * (3 * _pad8(K * D) + 3 * _pad8(K) + 3 * _pad8(D))
    tn = vmem_budget_bytes // max(1, bytes_per_lane)
    tn = max(512, min(16384, int(tn)))
    return (tn // 512) * 512


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
    bfloat16 passes; these matmuls are tiny relative to bandwidth)."""
    return jnp.dot(x, y, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


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


def _component_logpdfs_tile(x, a2, b2, log_norm, dof, dim):
    """(K, TN) component log-densities from a (D, TN) tile.

    ``a2 (K*D, D)`` stacks the inverse-Cholesky factors, ``b2 (K*D, 1)``
    the projected means; the Mahalanobis distances come from one streaming
    MXU matmul plus a selector contraction.
    """
    kd = a2.shape[0]
    K = kd // dim
    proj = _dot(a2, x)            # (K*D, TN)
    diff = proj - b2
    seg = _block_selector(K, kd, dim, x.dtype)
    maha = _dot(seg, diff * diff)  # (K, TN)
    if dof is not None:
        return log_norm - 0.5 * (dof + dim) * jnp.log1p(maha / dof)
    return log_norm - 0.5 * maha


def _weighted_lse(ind, w):
    """Column-wise weighted log-sum-exp of (K, TN) with (K, 1) weights."""
    m = jnp.max(ind, axis=0, keepdims=True)
    s = jnp.sum(w * jnp.exp(ind - m), axis=0, keepdims=True)
    return jnp.log(s) + m  # (1, TN)


def _logq_kernel(x_ref, a_ref, b_ref, ln_ref, w_ref, dof_ref, out_ref, *,
                 dim, student_t):
    dof = dof_ref[:] if student_t else None
    ind = _component_logpdfs_tile(x_ref[:], a_ref[:], b_ref[:], ln_ref[:], dof, dim)
    out_ref[:] = _weighted_lse(ind, w_ref[:])


def _rho_kernel(x_ref, a_ref, b_ref, ln_ref, w_ref, dof_ref,
                rho_ref, logq_ref, *, dim, student_t, tiny):
    dof = dof_ref[:] if student_t else None
    w = w_ref[:]
    ind = _component_logpdfs_tile(x_ref[:], a_ref[:], b_ref[:], ln_ref[:], dof, dim)
    lse = _weighted_lse(ind, w)
    # reference formula (pmc.pyx:37-41): exp(ind) * w / (exp(lse) + tiny)
    rho = jnp.exp(ind) * w / (jnp.exp(lse) + tiny)
    rho_ref[:] = jnp.where(w > 0, rho, 0.0)
    logq_ref[:] = lse


def _maha_kernel(x_ref, a_ref, b_ref, out_ref, *, dim):
    kd = a_ref.shape[0]
    K = kd // dim
    proj = _dot(a_ref[:], x_ref[:])
    diff = proj - b_ref[:]
    seg = _block_selector(K, kd, dim, proj.dtype)
    out_ref[:] = _dot(seg, diff * diff)


def _transform_kernel(z_ref, lat_ref, scale_ref, ct_ref, mu_ref, out_ref, *,
                      dim, n_comp):
    z = z_ref[:]                          # (D, TN)
    tn = z.shape[1]
    kd = ct_ref.shape[0]
    y = _dot(ct_ref[:], z)                # (K*D, TN); y[k*D+i, n] = (chol_k z_n)[i]
    lat = lat_ref[:]                      # (1, TN) int32
    ks = jax.lax.broadcasted_iota(jnp.int32, (n_comp, tn), 0)
    onehot = (lat == ks).astype(z.dtype)  # (K, TN)
    # expand the one-hot over each length-D sublane block, mask, then
    # contract the block structure away (no in-kernel reshapes)
    seg = _block_selector(n_comp, kd, dim, z.dtype)   # (K, K*D)
    pos = _pos_selector(dim, kd, z.dtype)             # (D, K*D)
    onehot_exp = _dot(seg.T, onehot)                  # (K*D, TN)
    y_sel = _dot(pos, y * onehot_exp)                 # (D, TN)
    mu_sel = _dot(mu_ref[:], onehot)                  # (D, K) @ (K, TN)
    out_ref[:] = mu_sel + y_sel * scale_ref[:]


def _kernel_uniform(shape, offset=0):
    """Uniform draws from the per-core hardware PRNG; in (0, 1] when
    ``offset=1`` (safe for log), in [0, 1) when ``offset=0``.  Mosaic has no
    uint32->f32 cast; the 24-bit values are sign-safe as int32."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i = pltpu.bitcast((bits >> 8) + offset, jnp.int32)
    return i.astype(jnp.float32) * (1.0 / (1 << 24))


def _kernel_normal(shape):
    """Standard normals via Box-Muller (cosine half) from the hardware
    PRNG."""
    u1 = _kernel_uniform(shape, offset=1)
    u2 = _kernel_uniform(shape, offset=0)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)


# Fixed Marsaglia-Tsang rounds for the in-kernel chi-square draw.  The
# per-round accept rate is >= 95%, so the probability that an element is
# still unresolved afterwards is <= 0.05^12 ~ 2.4e-16 -- about one particle
# per 1e8 steps of 3e7 particles falls back to the central value g = d
# instead (a bias far below float32 resolution of any estimate).
_MT_ROUNDS = 12


def _kernel_log_chi2(dof):
    """(1, TN) log of chi-square draws with per-lane degrees of freedom,
    drawn with the hardware PRNG via Marsaglia-Tsang with the log-space
    shape boost (exact; see ops.random.chi2_log for the algorithm)."""
    a = 0.5 * dof
    d = a + 1.0 - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)

    done = jnp.zeros(dof.shape, dtype=jnp.bool_)
    log_g = jnp.log(d)  # central fallback; overwritten on first accept
    for _ in range(_MT_ROUNDS):
        z = _kernel_normal(dof.shape)
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


def _transform_rng_kernel(seed_ref, lat_ref, scale_ref, ct_ref, mu_ref,
                          dof_ref, out_ref, *, dim, n_comp, student_t):
    """Like :func:`_transform_kernel`, but ALL randomness beyond the
    component choice is generated IN-KERNEL from the TPU hardware PRNG: the
    standard normals (Box-Muller) and, for Student-t, the per-particle
    chi-square scale (Marsaglia-Tsang with log-space boost) -- no (D, N)
    normal array and no chi-square rejection pass ever touch the host RNG
    path or HBM.  Each grid step reseeds with (seed, program_id) so tiles
    draw independent streams; results are deterministic for a fixed seed
    and tile size."""
    tn = out_ref.shape[1]
    kd = ct_ref.shape[0]
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    z = _kernel_normal((dim, tn))

    y = _dot(ct_ref[:], z)
    lat = lat_ref[:]
    ks = jax.lax.broadcasted_iota(jnp.int32, (n_comp, tn), 0)
    onehot = (lat == ks).astype(jnp.float32)
    seg = _block_selector(n_comp, kd, dim, jnp.float32)
    pos = _pos_selector(dim, kd, jnp.float32)
    onehot_exp = _dot(seg.T, onehot)
    y_sel = _dot(pos, y * onehot_exp)
    mu_sel = _dot(mu_ref[:], onehot)
    if student_t:
        # per-lane dof via one-hot contraction, then the in-kernel chi2;
        # scale = sqrt(dof / chi2) on the log scale
        dof_sel = _dot(dof_ref[:], onehot)  # (1, K) @ (K, TN) -> (1, TN)
        log_chi2 = _kernel_log_chi2(dof_sel)
        scale = jnp.exp(0.5 * (jnp.log(dof_sel) - log_chi2))
    else:
        scale = scale_ref[:]
    out_ref[:] = mu_sel + y_sel * scale


def _small_specs(shapes):
    """Block specs for small replicated (non-tiled) operands."""
    return [
        pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]


def _lane_spec(rows, tile):
    return pl.BlockSpec((rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_logq(xT, a2, b2, log_norm, weights, dof, *, dim):
    """Mixture log-density ``(N,)`` for transposed points ``xT (D, N)``.

    :param a2: ``(K*D, D)`` with ``a2[k*D+i, d] = U_k[i, d]`` (U = inverse
        Cholesky factor of the k-th covariance; ``inv_chol.reshape(K*D, D)``).
    :param b2: ``(K*D, 1)`` projected means ``b2[k*D+i, 0] = (U_k mu_k)[i]``.
    :param log_norm: ``(K, 1)`` per-component log-normalizations.
    :param weights: ``(K, 1)`` linear component weights (0 = dead).
    :param dof: ``(K, 1)`` degrees of freedom, or None for Gaussian.
    """
    kd = a2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim)
    xT, n_orig = _pad_lanes(xT, tile)
    grid = xT.shape[1] // tile
    student_t = dof is not None
    if dof is None:
        dof = jnp.zeros((K, 1), dtype=xT.dtype)

    out = pl.pallas_call(
        functools.partial(_logq_kernel, dim=dim, student_t=student_t),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            *_small_specs([(kd, dim), (kd, 1), (K, 1), (K, 1), (K, 1)]),
        ],
        out_specs=_lane_spec(1, tile),
        out_shape=jax.ShapeDtypeStruct((1, xT.shape[1]), xT.dtype),
        interpret=INTERPRET,
    )(xT, a2, b2, log_norm, weights, dof)
    return out[0, :n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_rho(xT, a2, b2, log_norm, weights, dof, *, dim):
    """Rao-Blackwellized responsibilities ``rho (K, N)`` and mixture
    log-density ``(N,)`` in one fused pass (arguments as
    :func:`fused_logq`)."""
    kd = a2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim)
    xT, n_orig = _pad_lanes(xT, tile)
    grid = xT.shape[1] // tile
    student_t = dof is not None
    if dof is None:
        dof = jnp.zeros((K, 1), dtype=xT.dtype)
    tiny = float(jnp.finfo(xT.dtype).tiny)

    rho, logq = pl.pallas_call(
        functools.partial(_rho_kernel, dim=dim, student_t=student_t, tiny=tiny),
        grid=(grid,),
        in_specs=[
            _lane_spec(dim, tile),
            *_small_specs([(kd, dim), (kd, 1), (K, 1), (K, 1), (K, 1)]),
        ],
        out_specs=[_lane_spec(K, tile), _lane_spec(1, tile)],
        out_shape=[
            jax.ShapeDtypeStruct((K, xT.shape[1]), xT.dtype),
            jax.ShapeDtypeStruct((1, xT.shape[1]), xT.dtype),
        ],
        interpret=INTERPRET,
    )(xT, a2, b2, log_norm, weights, dof)
    return rho[:, :n_orig], logq[0, :n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_maha(xT, a2, b2, *, dim):
    """``(K, N)`` squared Mahalanobis distances (arguments as
    :func:`fused_logq`)."""
    kd = a2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim)
    xT, n_orig = _pad_lanes(xT, tile)
    grid = xT.shape[1] // tile

    out = pl.pallas_call(
        functools.partial(_maha_kernel, dim=dim),
        grid=(grid,),
        in_specs=[_lane_spec(dim, tile), *_small_specs([(kd, dim), (kd, 1)])],
        out_specs=_lane_spec(K, tile),
        out_shape=jax.ShapeDtypeStruct((K, xT.shape[1]), xT.dtype),
        interpret=INTERPRET,
    )(xT, a2, b2)
    return out[:, :n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_transform_rng(seed, latent, scale, ct2, mu2, dof=None, *, dim):
    """Mixture affine transform with IN-KERNEL randomness:
    ``out[:, n] = mu[latent[n]] + (chol[latent[n]] @ z_n) * scale_n`` where
    ``z_n`` are Box-Muller normals from the TPU hardware PRNG and, when
    ``dof (1, K)`` is given (Student-t), ``scale_n = sqrt(dof_n / chi2_n)``
    with the chi-square ALSO drawn in-kernel (Marsaglia-Tsang; the ``scale``
    argument is then ignored).

    :param seed: int32 scalar seed (derive from a jax key).
    :param latent, scale, ct2, mu2: as :func:`fused_transform`.
    :param dof: ``(1, K)`` degrees of freedom, or None for Gaussian.
    """
    kd = ct2.shape[0]
    K = kd // dim
    tile = pick_tile(K, dim)
    n = latent.shape[0]
    lat2, n_orig = _pad_lanes(latent[None, :].astype(jnp.int32), tile)
    scale2, _ = _pad_lanes(scale[None, :], tile)
    grid = lat2.shape[1] // tile
    seed = jnp.asarray(seed, dtype=jnp.int32).reshape(1)
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
        interpret=INTERPRET,
    )(seed, lat2, scale2, ct2, mu2, dof)
    return out[:, :n_orig]


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
    tile = pick_tile(K, dim)
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
        interpret=INTERPRET,
    )(zT, lat2, scale2, ct2, mu2)
    return out[:, :n_orig]
