"""Mixture reduction (the reference's ``examples/mixture_reduction.py``
workload): compress a 400-component Gaussian mixture with hierarchical
clustering (preserves all 10 initial-guess components) and with VBMerge
(automatically selects the number of survivors).
"""

import numpy as np
from scipy.stats import chi2

import pypmc_tpu as pt

D = 2          # dimension
K = 400        # input components
W = np.eye(D)  # Wishart mean
nu = 5         # Wishart dof

rng = np.random.default_rng(0)


def wishart_draw():
    chol = np.linalg.cholesky(W)
    tmp = np.zeros((D, D))
    for i in range(D):
        for j in range(i + 1):
            if i == j:
                tmp[i, j] = np.sqrt(chi2.rvs(nu - (i + 1) + 1, random_state=rng))
            else:
                tmp[i, j] = rng.normal(0, 1)
    return chol @ tmp @ tmp.T @ chol.T


covariances = [wishart_draw() for _ in range(K)]
means = [rng.multivariate_normal(np.zeros(D), sigma) for sigma in covariances]
weights = np.ones(K)

input_mixture = pt.density.create_gaussian_mixture(means, covariances, weights)

K_out = 10
initial_guess = pt.density.create_gaussian_mixture(
    means[:K_out], covariances[:K_out], weights[:K_out]
)

# ---- hierarchical clustering: every component preserved ---- #
h = pt.mix_adapt.Hierarchical(input_mixture, initial_guess)
steps = h.run()
print("hierarchical: %s steps, %d components remain" % (steps, len(h.g)))

# ---- VBMerge: survivors chosen automatically ---- #
vb = pt.mix_adapt.VBMerge(input_mixture, N=1000, initial_guess=initial_guess)
print("Start variational Bayes:")
vb.run()
vb_mix = vb.make_mixture()
print("VBMerge: %d components remain" % len(vb_mix))

try:
    import matplotlib.pyplot as plt

    plt.figure(figsize=(15, 5))
    for idx, (mix, title) in enumerate(
        [(input_mixture, "input (400)"), (h.g, "hierarchical"), (vb_mix, "VBMerge")]
    ):
        plt.subplot(1, 3, idx + 1)
        plt.title(title)
        pt.tools.plot_mixture(mix)
        plt.xlim(-5, 5)
        plt.ylim(-5, 5)
    plt.savefig("mixture_reduction_example.png", dpi=100)
    print("wrote mixture_reduction_example.png")
except ImportError:
    print('For plotting "matplotlib" needs to be installed')
