"""Parameter init and primitive layers.

Params are nested dicts whose keys mirror the reference's torch module names
(model_zoo_v2.py) so checkpoints convert 1:1:
  conv:  {"weight": (O, I, kh, kw), "bias": (O,)}
  prelu: {"weight": (C,)}
  gdn:   {"beta": (C,), "gamma": (C, C)}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

_DN = ("NCHW", "OIHW", "NCHW")


def conv_init(key, cin, cout, k):
    """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5))."""
    wk, bk = jax.random.split(key)
    fan_in = cin * k * k
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(wk, (cout, cin, k, k), jnp.float32, -bound, bound)
    b = jax.random.uniform(bk, (cout,), jnp.float32, -bound, bound)
    return {"weight": w, "bias": b}


def conv2d(p, x, stride: int = 1, mask=None, dtype=None):
    """VALID conv. With dtype=bfloat16 the MXU runs the contraction in bf16
    with fp32 accumulation; elementwise math stays fp32. Safe for the
    analysis/synthesis transform (symbols are quantized; the entropy network
    must stay fp32 for the encoder/decoder CDF bit-exactness contract)."""
    w = p["weight"]
    if mask is not None:
        w = w * mask
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = lax.conv_general_dilated(x, w, (stride, stride), "VALID",
                                 dimension_numbers=_DN,
                                 preferred_element_type=jnp.float32)
    return y + p["bias"][None, :, None, None]


def prelu_init(channels, init: float = 0.25):
    return {"weight": jnp.full((channels,), init, jnp.float32)}


def prelu(p, x):
    a = p["weight"][None, :, None, None]
    return jnp.where(x >= 0, x, a * x)


def sigmoid(x):
    return jax.nn.sigmoid(x)
