"""Analytic pdfs used by tests and examples.
(API parity with ``pypmc/tools/_probability_densities.py``.)"""

import jax.numpy as jnp

__all__ = ["unnormalized_log_pdf_gauss", "normalized_pdf_gauss"]


def unnormalized_log_pdf_gauss(x, mu, inv_sigma):
    return -0.5 * jnp.dot(jnp.dot(x - mu, inv_sigma), x - mu)


def normalized_pdf_gauss(x, mu, inv_sigma):
    _, log_det_inv = jnp.linalg.slogdet(inv_sigma)
    return jnp.exp(
        unnormalized_log_pdf_gauss(x, mu, inv_sigma)
        - 0.5 * len(mu) * jnp.log(2.0 * jnp.pi)
        + 0.5 * log_det_inv
    )
