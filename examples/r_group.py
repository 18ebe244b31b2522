"""Group Markov chains by the Gelman-Rubin R value (the reference's
``examples/r_group.py`` workload): five chains initialized in the two modes
of a bimodal target only explore their own mode; r_group recovers the two
chain groups, and make_r_gaussmix builds a long-patches mixture from them.
"""

import numpy as np
import pypmc_tpu as pt

# the same initial local Student-t proposal for all chains
prop_dof = 50.0
prop_sigma = np.array([[0.1, 0.0], [0.0, 0.02]])
prop = pt.density.LocalStudentT(prop_sigma, prop_dof)

# bimodal Gaussian target with well separated modes
component_weights = np.array([0.3, 0.7])
mean0 = np.array([5.0, 0.01])
covariance0 = np.array([[0.01, 0.003], [0.003, 0.0025]])
mean1 = np.array([-4.0, 1.0])
covariance1 = np.array([[0.1, 0.0], [0.0, 0.02]])

target_mixture = pt.density.create_gaussian_mixture(
    [mean0, mean1], [covariance0, covariance1], component_weights
)
log_target = target_mixture.evaluate_fn()

# two chains in the mode at [5, 0.01], three in the mode at [-4, 1]
starts = [np.array([4.999, 0.0])] * 2 + [np.array([-4.0001, 0.999])] * 3

mcs = [
    pt.sampler.AdaptiveMarkovChain(log_target, prop, start, rng=seed)
    for seed, start in enumerate(starts)
]

# run and discard burn-in
for mc in mcs:
    mc.run(10**2)
    mc.clear()

# run 10,000 steps adapting the proposal every 500 steps
for mc in mcs:
    for i in range(20):
        mc.run(500)
        mc.adapt()

stacked_values = [mc.samples[:] for mc in mcs]

expected_groups = [[0, 1], [2, 3, 4]]
found_groups = pt.mix_adapt.r_group(
    [np.mean(chain, axis=0) for chain in stacked_values],
    [np.var(chain, axis=0) for chain in stacked_values],
    len(stacked_values[0]),
)
print("Expect %s" % expected_groups)
print("Have   %s" % found_groups)

result = pt.mix_adapt.make_r_gaussmix(stacked_values)
print("long-patches mixture with %d components" % len(result))

try:
    import matplotlib.pyplot as plt

    pt.tools.plot_mixture(result, cmap="jet")
    plt.savefig("r_group_example.png", dpi=100)
    print("wrote r_group_example.png")
except ImportError:
    print('For plotting "matplotlib" needs to be installed')
