"""ClipData: leaky clamp to [0,1] with slope 0.01 outside.

Behavioral reference: model_zoo_v2.py:8-34. Both the forward leak and the
gradient use slope 0.01 in the out-of-range regions, so plain autodiff of the
forward expression reproduces the custom backward exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["clip_data"]


def clip_data(x):
    y = jnp.where(x < 0, x * 0.01, x)
    y = jnp.where(x > 1, 1 + (x - 1) * 0.01, y)
    return y
