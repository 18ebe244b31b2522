"""Fit a Gaussian mixture to data with variational Bayes (the reference's
``examples/variational.py`` workload): draw 500 samples from a bimodal
Gaussian mixture, fit with K=20 maximum components, expect two survivors.
"""

import numpy as np
import pypmc_tpu as pt

# ---- 1. define a Gaussian mixture ---- #
component_weights = np.array([0.3, 0.7])
mean0 = np.array([5.0, 0.01])
covariance0 = np.array([[0.01, 0.003], [0.003, 0.0025]])
mean1 = np.array([-4.0, 1.0])
covariance1 = np.array([[0.1, 0.0], [0.0, 0.02]])

target_mix = pt.density.create_gaussian_mixture(
    [mean0, mean1], [covariance0, covariance1], component_weights
)

# ---- 2. generate demo data ---- #
data = target_mix.propose(500, rng=1)

# ---- 3. adapt a Gaussian mixture with VB ---- #
K = 20
vb = pt.mix_adapt.GaussianInference(data, K)
converged = vb.run(100)
print("-----------------------------")

fit_mixture = vb.make_mixture()

# ---- 4. print results ---- #
if converged is None:
    print("\nThe adaptation did not converge.\n")
else:
    print("\nConverged after %i iterations.\n" % converged)

print("final  component weights: " + str(fit_mixture.weights))
print("target component weights: " + str(target_mix.weights))
for k, c in enumerate(fit_mixture.components):
    print("component %i mean:" % k, c.mu)

try:
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 5))

    def set_axlimits():
        plt.xlim(-6.0, +6.0)
        plt.ylim(-0.2, +1.5)

    plt.subplot(121)
    plt.title("original mixture")
    pt.tools.plot_mixture(target_mix, cmap="jet")
    set_axlimits()

    plt.subplot(122)
    plt.title("variational fit")
    pt.tools.plot_mixture(fit_mixture, cmap="nipy_spectral")
    set_axlimits()

    plt.savefig("variational_example.png", dpi=100)
    print("wrote variational_example.png")
except ImportError:
    print('For plotting "matplotlib" needs to be installed')
