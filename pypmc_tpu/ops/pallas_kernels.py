"""Fused Pallas TPU kernels for the mixture hot path.

These kernels are the TPU-native analog of the reference's Cython layer: the
operations that dominate at N ~ 10^6..10^8 particles, written so that NO
O(N*K*D) intermediate ever touches HBM (the plain XLA formulation
materializes the (N, K, D) projection tensor, which both saturates HBM
bandwidth and OOMs at large N):

* :func:`fused_logq` -- mixture log-density: per-tile (TN, D) @ (D, K*D)
  projection on the MXU, squared-distance reduction, component log-pdfs and
  the weighted log-sum-exp, reading x once and writing only (N,).
* :func:`fused_rho` -- same, plus the Rao-Blackwellized responsibilities
  rho (N, K) (the PMC E-step input, ``mix_adapt/pmc.pyx:23-43``).
* :func:`fused_transform` -- the mixture-proposal affine transform
  ``sample = mu[latent] + (chol[latent] @ z) * scale`` with the per-particle
  component select done in VMEM via a one-hot contraction instead of an
  (N, D, D) parameter gather in HBM.

All kernels pad N to the tile size internally; K and D are static per
compilation.  dtype follows the inputs (designed for float32 on TPU).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_logq", "fused_rho", "fused_maha", "fused_transform", "pick_tile"]

# set True (e.g. from tests) to run the kernels in the Pallas interpreter --
# lets the kernel logic be verified on the CPU backend
INTERPRET = False


def pick_tile(K: int, D: int, vmem_budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Choose the particle-tile size so the per-tile working set stays well
    inside VMEM.  Lane dimensions are padded to 128 on TPU, so the cost per
    row is dominated by a handful of (TN, pad128(K*D)) buffers (plus double
    buffering across the grid)."""

    def pad128(n):
        return (n + 127) // 128 * 128

    bytes_per_row = 4 * (3 * pad128(D) + 3 * pad128(K * D) + 3 * pad128(K))
    tn = vmem_budget_bytes // max(1, bytes_per_row)
    tn = max(256, min(2048, int(tn)))
    # multiple of 256 keeps the sublane dimension aligned for f32
    return (tn // 256) * 256


def _pad_rows(x, tile):
    n = x.shape[0]
    padded = (n + tile - 1) // tile * tile
    if padded == n:
        return x, n
    pad = [(0, padded - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad), n


def _dot(x, y):
    """float32-accurate MXU matmul (the default TPU matmul precision uses
    bfloat16 passes, which costs ~3 decimal digits in the Mahalanobis
    distances; these matmuls are tiny, the kernels stay bandwidth-bound)."""
    return jnp.dot(x, y, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _block_sum_selector(kd, K, dim, dtype):
    """(K*D, K) 0/1 matrix summing each length-D lane block: S[k*D+i, k] = 1.

    Mosaic does not support lane-splitting reshapes like (TN, K*D) ->
    (TN, K, D) inside a kernel, so per-block reductions are expressed as a
    small matmul instead (runs on the MXU)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (kd, K), 0) // dim
    cols = jax.lax.broadcasted_iota(jnp.int32, (kd, K), 1)
    return (rows == cols).astype(dtype)


def _lane_pos_selector(kd, dim, dtype):
    """(K*D, D) 0/1 matrix extracting the within-block lane position:
    R[k*D+i, i] = 1."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (kd, dim), 0) % dim
    cols = jax.lax.broadcasted_iota(jnp.int32, (kd, dim), 1)
    return (rows == cols).astype(dtype)


def _component_logpdfs_tile(x, a, b, log_norm, dof, dim):
    """(TN, K) component log-densities from a (TN, D) tile.

    ``a`` is the (D, K*D) stacked transposed inverse-Cholesky factors,
    ``b`` the (1, K*D) projected means, so the Mahalanobis distances come
    from ONE MXU matmul per tile.
    """
    kd = a.shape[1]
    K = kd // dim
    proj = _dot(x, a)  # (TN, K*D)
    diff = proj - b
    seg = _block_sum_selector(kd, K, dim, x.dtype)
    maha = _dot(diff * diff, seg)  # (TN, K)
    if dof is not None:
        return log_norm - 0.5 * (dof + dim) * jnp.log1p(maha / dof)
    return log_norm - 0.5 * maha


def _weighted_lse(ind, w):
    """Row-wise weighted log-sum-exp of (TN, K) with (1, K) linear weights."""
    m = jnp.max(ind, axis=1, keepdims=True)
    s = jnp.sum(w * jnp.exp(ind - m), axis=1, keepdims=True)
    return jnp.log(s) + m  # (TN, 1)


def _logq_kernel(x_ref, a_ref, b_ref, ln_ref, w_ref, dof_ref, out_ref, *, dim, student_t):
    x = x_ref[:]
    dof = dof_ref[:] if student_t else None
    ind = _component_logpdfs_tile(x, a_ref[:], b_ref[:], ln_ref[:], dof, dim)
    out_ref[:] = _weighted_lse(ind, w_ref[:])  # (TN, 1)


def _rho_kernel(x_ref, a_ref, b_ref, ln_ref, w_ref, dof_ref,
                rho_ref, logq_ref, *, dim, student_t, tiny):
    x = x_ref[:]
    dof = dof_ref[:] if student_t else None
    w = w_ref[:]
    ind = _component_logpdfs_tile(x, a_ref[:], b_ref[:], ln_ref[:], dof, dim)
    lse = _weighted_lse(ind, w)  # (TN, 1)
    # reference formula (pmc.pyx:37-41): exp(ind) * w / (exp(lse) + tiny)
    rho = jnp.exp(ind) * w / (jnp.exp(lse) + tiny)
    rho_ref[:] = jnp.where(w > 0, rho, 0.0)
    logq_ref[:] = lse


def _maha_kernel(x_ref, a_ref, b_ref, out_ref, *, dim):
    kd = a_ref.shape[1]
    K = kd // dim
    proj = _dot(x_ref[:], a_ref[:])
    diff = proj - b_ref[:]
    seg = _block_sum_selector(kd, K, dim, proj.dtype)
    out_ref[:] = _dot(diff * diff, seg)


def _transform_kernel(z_ref, lat_ref, scale_ref, ct_ref, mu_ref, out_ref, *, dim, n_comp):
    tn = z_ref.shape[0]
    z = z_ref[:]
    y = _dot(z, ct_ref[:])  # (TN, K*D)
    kd = ct_ref.shape[1]
    lat = lat_ref[:]  # (TN, 1)
    ks = jax.lax.broadcasted_iota(jnp.int32, (tn, n_comp), 1)
    onehot = (lat == ks).astype(z.dtype)  # (TN, K)
    # expand the one-hot over each length-D lane block, mask, then contract
    # the block structure away with selector matmuls (no in-kernel reshapes)
    seg = _block_sum_selector(kd, n_comp, dim, z.dtype)  # (K*D, K)
    pos = _lane_pos_selector(kd, dim, z.dtype)           # (K*D, D)
    onehot_exp = _dot(onehot, seg.T)
    y_sel = _dot(y * onehot_exp, pos)
    mu_sel = _dot(onehot, mu_ref[:])
    out_ref[:] = mu_sel + y_sel * scale_ref[:]


def _small_specs(tile, shapes):
    """Block specs for small replicated (non-tiled) operands."""
    return [
        pl.BlockSpec(s, lambda i: (0,) * len(s), memory_space=pltpu.VMEM)
        for s in shapes
    ]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_logq(x, a, b, log_norm, weights, dof, *, dim):
    """Mixture log-density ``(N,)`` for points ``x (N, D)``.

    :param a: ``(D, K*D)`` with ``a[d, k*D+i] = U_k[i, d]`` (U = inverse
        Cholesky factor of the k-th covariance).
    :param b: ``(1, K*D)`` projected means ``b[0, k*D+i] = (U_k mu_k)[i]``.
    :param log_norm: ``(1, K)`` per-component log-normalizations.
    :param weights: ``(1, K)`` linear component weights (0 = dead).
    :param dof: ``(1, K)`` degrees of freedom, or None for Gaussian.
    """
    n = x.shape[0]
    kd = a.shape[1]
    K = kd // dim
    tile = pick_tile(K, dim)
    x, n_orig = _pad_rows(x, tile)
    grid = x.shape[0] // tile
    student_t = dof is not None
    if dof is None:
        dof = jnp.zeros((1, K), dtype=x.dtype)

    out = pl.pallas_call(
        functools.partial(_logq_kernel, dim=dim, student_t=student_t),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_small_specs(tile, [(dim, kd), (1, kd), (1, K), (1, K), (1, K)]),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 1), x.dtype),
        interpret=INTERPRET,
    )(x, a, b, log_norm, weights, dof)
    return out.reshape(-1)[:n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_rho(x, a, b, log_norm, weights, dof, *, dim):
    """Rao-Blackwellized responsibilities ``rho (N, K)`` and mixture
    log-density ``(N,)`` in one fused pass (arguments as
    :func:`fused_logq`)."""
    n = x.shape[0]
    kd = a.shape[1]
    K = kd // dim
    tile = pick_tile(K, dim)
    x, n_orig = _pad_rows(x, tile)
    grid = x.shape[0] // tile
    student_t = dof is not None
    if dof is None:
        dof = jnp.zeros((1, K), dtype=x.dtype)
    tiny = float(jnp.finfo(x.dtype).tiny)

    rho, logq = pl.pallas_call(
        functools.partial(_rho_kernel, dim=dim, student_t=student_t, tiny=tiny),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_small_specs(tile, [(dim, kd), (1, kd), (1, K), (1, K), (1, K)]),
        ],
        out_specs=[
            pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((x.shape[0], K), x.dtype),
            jax.ShapeDtypeStruct((x.shape[0], 1), x.dtype),
        ],
        interpret=INTERPRET,
    )(x, a, b, log_norm, weights, dof)
    return rho[:n_orig], logq.reshape(-1)[:n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_maha(x, a, b, *, dim):
    """``(N, K)`` squared Mahalanobis distances (arguments as
    :func:`fused_logq`) without the ``(N, K, D)`` HBM intermediate."""
    kd = a.shape[1]
    K = kd // dim
    tile = pick_tile(K, dim)
    x, n_orig = _pad_rows(x, tile)
    grid = x.shape[0] // tile

    out = pl.pallas_call(
        functools.partial(_maha_kernel, dim=dim),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_small_specs(tile, [(dim, kd), (1, kd)]),
        ],
        out_specs=pl.BlockSpec((tile, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], K), x.dtype),
        interpret=INTERPRET,
    )(x, a, b)
    return out[:n_orig]


@functools.partial(jax.jit, static_argnames=("dim",))
def fused_transform(z, latent, scale, ct, mu, *, dim):
    """Per-particle mixture affine transform
    ``out[n] = mu[latent[n]] + (chol[latent[n]] @ z[n]) * scale[n]``.

    :param z: ``(N, D)`` standard normals.
    :param latent: ``(N,)`` int32 component indices.
    :param scale: ``(N,)`` per-particle scale (1 for Gaussian,
        ``sqrt(dof/chi2)`` for Student-t).
    :param ct: ``(D, K*D)`` with ``ct[d, k*D+i] = chol_k[i, d]``.
    :param mu: ``(K, D)`` component means.
    """
    n = z.shape[0]
    kd = ct.shape[1]
    K = kd // dim
    tile = pick_tile(K, dim)
    z, n_orig = _pad_rows(z, tile)
    latent, _ = _pad_rows(latent, tile)
    scale, _ = _pad_rows(scale, tile)
    grid = z.shape[0] // tile

    out = pl.pallas_call(
        functools.partial(_transform_kernel, dim=dim, n_comp=K),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_small_specs(tile, [(dim, kd), (K, dim)]),
        ],
        out_specs=pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((z.shape[0], dim), z.dtype),
        interpret=INTERPRET,
    )(z, latent.reshape(-1, 1), scale.reshape(-1, 1), ct, mu)
    return out[:n_orig]
