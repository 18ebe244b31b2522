"""Plotting tests (skip cleanly without matplotlib, like the reference's
``tools/plot_test.py:9-13``)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402

from pypmc_tpu.density import create_gaussian_mixture  # noqa: E402
from pypmc_tpu.tools import plot_mixture, plot_responsibility  # noqa: E402


MEANS = np.array([[0.0, 0.0], [3.0, 3.0], [-2.0, 1.0]])
COVS = np.array([np.eye(2) * 0.5, [[1.0, 0.4], [0.4, 0.8]], np.eye(2)])
WEIGHTS = np.array([0.5, 0.3, 0.2])


def test_plot_mixture_draws_ellipses():
    plt.figure()
    mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
    plot_mixture(mix)
    ax = plt.gca()
    # one filled + one edge ellipse per component, plus the center scatter
    assert len(ax.patches) == 2 * len(mix)
    plt.close("all")


def test_plot_mixture_cutoff_and_weights():
    plt.figure()
    mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
    mappable = plot_mixture(mix, cutoff=0.25, visualize_weights=True)
    ax = plt.gca()
    assert len(ax.patches) == 2 * 2  # two components survive the cutoff
    assert mappable is not None  # usable for plt.colorbar
    plt.close("all")


def test_plot_mixture_rejects_bad_axes():
    mix = create_gaussian_mixture(MEANS, COVS, WEIGHTS)
    with pytest.raises(AssertionError):
        plot_mixture(mix, i=1, j=1)
    plt.close("all")


def test_plot_responsibility():
    plt.figure()
    rng = np.random.default_rng(0)
    data = rng.normal(size=(50, 2))
    resp = rng.random((50, 3))
    plot_responsibility(data, resp)
    assert len(plt.gca().collections) >= 1
    plt.close("all")


def test_plot_responsibility_validates_shapes():
    with pytest.raises(AssertionError):
        plot_responsibility(np.zeros((10, 3)), np.zeros((10, 2)))  # 3-D data
    with pytest.raises(AssertionError):
        plot_responsibility(np.zeros((10, 2)), np.zeros((5, 2)))  # length mismatch
