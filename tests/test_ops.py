"""Tests for the low-level ops: batched chol/inv/logdet and weighted LSE."""

import numpy as np
import jax.numpy as jnp
import pytest

from pypmc_tpu.ops.linalg import bilinear_sym, chol_inv_det
from pypmc_tpu.ops.lse import logsumexp, logsumexp2D, regularize


def test_bilinear_sym():
    m = np.array([[2.0, 0.5], [0.5, 1.0]])
    v = np.array([1.0, -2.0])
    expected = v @ m @ v
    assert np.allclose(float(bilinear_sym(jnp.asarray(m), jnp.asarray(v))), expected)


def test_bilinear_sym_batched():
    rng = np.random.default_rng(42)
    ms = rng.normal(size=(5, 3, 3))
    ms = ms + np.swapaxes(ms, -1, -2)
    vs = rng.normal(size=(5, 3))
    expected = np.einsum("ki,kij,kj->k", vs, ms, vs)
    assert np.allclose(np.asarray(bilinear_sym(jnp.asarray(ms), jnp.asarray(vs))), expected)


def test_chol_inv_det_valid():
    sigma = np.array([[0.01, 0.003], [0.003, 0.0025]])
    res = chol_inv_det(jnp.asarray(sigma))
    assert bool(res.valid)
    assert np.allclose(np.asarray(res.chol) @ np.asarray(res.chol).T, sigma)
    assert np.allclose(np.asarray(res.inv), np.linalg.inv(sigma))
    assert np.isclose(float(res.log_det), np.log(np.linalg.det(sigma)))
    # inv_chol is the inverse of the cholesky factor
    assert np.allclose(np.asarray(res.inv_chol) @ np.asarray(res.chol), np.eye(2), atol=1e-12)


def test_chol_inv_det_invalid():
    not_pd = np.array([[1.0, 2.0], [2.0, 1.0]])  # indefinite
    res = chol_inv_det(jnp.asarray(not_pd))
    assert not bool(res.valid)


def test_chol_inv_det_batched_mixed_validity():
    good = np.array([[2.0, 0.1], [0.1, 1.0]])
    bad = np.array([[1.0, 5.0], [5.0, 1.0]])
    res = chol_inv_det(jnp.stack([jnp.asarray(good), jnp.asarray(bad)]))
    valid = np.asarray(res.valid)
    assert valid[0] and not valid[1]
    # the valid member's results are not polluted by the invalid one
    assert np.allclose(np.asarray(res.inv[0]), np.linalg.inv(good))


def test_regularize():
    x = jnp.asarray(np.array([0.0, 1.0, 0.0, -2.0]))
    out = np.asarray(regularize(x))
    tiny = np.finfo(np.float64).tiny
    assert out[0] == tiny and out[2] == tiny
    assert out[1] == 1.0 and out[3] == -2.0


def test_logsumexp_weighted():
    a = np.array([-1.0, 2.0, 0.5])
    w = np.array([0.2, 0.5, 0.3])
    expected = np.log(np.sum(w * np.exp(a)))
    assert np.isclose(float(logsumexp(jnp.asarray(a), jnp.asarray(w))), expected)


def test_logsumexp_zero_weight_neginf():
    # a dead component: weight 0, arbitrary log-density; contributes nothing
    a = np.array([-1e5, 2.0])
    w = np.array([0.0, 1.0])
    assert np.isclose(float(logsumexp(jnp.asarray(a), jnp.asarray(w))), 2.0)


def test_logsumexp_extreme_values_stable():
    a = np.array([1000.0, 999.0])
    w = np.array([0.5, 0.5])
    out = float(logsumexp(jnp.asarray(a), jnp.asarray(w)))
    expected = 1000.0 + np.log(0.5 * (1 + np.exp(-1.0)))
    assert np.isclose(out, expected)


def test_logsumexp2D():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(7, 4))
    w = np.abs(rng.normal(size=4))
    expected = np.array([np.log(np.sum(w * np.exp(row))) for row in a])
    assert np.allclose(np.asarray(logsumexp2D(jnp.asarray(a), jnp.asarray(w))), expected)
