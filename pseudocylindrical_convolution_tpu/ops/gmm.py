"""GMM rate loss: -log sum_k w_k (Phi((x+.5-mu_k)/d_k) - Phi((x-.5-mu_k)/d_k)).

Behavioral reference: extension/entropy_gmm_cuda.cu:35-69. The reference
computes analytic gradients in the forward kernel; those are exactly the
derivatives of this expression, so plain autodiff reproduces them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["entropy_gmm_loss"]

_S2 = 0.7071067811865476  # 1/sqrt(2)


def _phi(x):
    return 0.5 + 0.5 * jax.lax.erf(x)


def entropy_gmm_loss(weight, delta, mean, label):
    """weight/delta/mean: (n, ng); label: (n, 1) or (n,). Returns (n,)."""
    label = label.reshape(-1, 1)
    inv = 1.0 / delta
    fa = _phi((label - 0.5 - mean) * inv * _S2)
    fb = _phi((label + 0.5 - mean) * inv * _S2)
    p = jnp.sum(weight * (fb - fa), axis=1)
    return -jnp.log(p + 1e-7)
