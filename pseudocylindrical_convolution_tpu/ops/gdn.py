"""GDN / IGDN masked to the valid band region.

Behavioral reference: PCONV_operator/PseudoContextV2.py:133-216 (PseudoGDNV2)
and PCONV_operator/GDN.py:6-22 (LowerBound clamp with gradient gating).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.ops.fill import valid_mask

__all__ = ["gdn_init", "gdn_apply", "lower_bound"]

_REPARAM_OFFSET = 2.0 ** -18
_PEDESTAL = _REPARAM_OFFSET ** 2
_BETA_MIN = 1e-6
_BETA_BOUND = (_BETA_MIN + _PEDESTAL) ** 0.5
_GAMMA_BOUND = _REPARAM_OFFSET


@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x >= bound)


def _lb_bwd(res, g):
    # pass grads through when not clamped, or when the grad pushes upward
    # (g < 0 increases x under gradient descent) -- GDN.py:15-21.
    passed = res | (g < 0)
    return (jnp.where(passed, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


def gdn_init(ch: int, gamma_init: float = 0.1):
    beta = np.sqrt(np.ones(ch, dtype=np.float64) + _PEDESTAL)
    gamma = np.sqrt(gamma_init * np.eye(ch, dtype=np.float64) + _PEDESTAL)
    return {"beta": jnp.asarray(beta, jnp.float32),
            "gamma": jnp.asarray(gamma, jnp.float32)}


def gdn_apply(params, x, geom: Geometry, inverse: bool = False, dtype=None):
    """x: (N*npart, C, h, W)."""
    nb, ch, h, w = x.shape
    m = jnp.asarray(valid_mask(geom, h, w)).reshape(1, geom.npart, 1, h, w)
    mask = jnp.broadcast_to(m, (nb // geom.npart, geom.npart, 1, h, w)
                            ).reshape(nb, 1, h, w)
    x = x * mask
    beta = lower_bound(params["beta"], _BETA_BOUND) ** 2 - _PEDESTAL
    gamma = lower_bound(params["gamma"], _GAMMA_BOUND) ** 2 - _PEDESTAL
    # 1x1 conv on x^2: out[o] = sum_i gamma[o, i] * x2[i] + beta[o]
    x2 = x * x
    if dtype is not None:
        x2 = x2.astype(dtype)
        gamma = gamma.astype(dtype)
    norm = jnp.einsum("nihw,oi->nohw", x2, gamma,
                      preferred_element_type=jnp.float32
                      ) + beta[None, :, None, None]
    norm = jnp.sqrt(norm)
    norm = norm * mask + (1.0 - mask)
    return x * norm if inverse else x / norm
