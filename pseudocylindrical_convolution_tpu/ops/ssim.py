"""SSIM with an 11x11 Gaussian window (sigma 1.5), zero-padded SAME conv.

Behavioral reference: PCONV_operator/pytorch_ssim.py:7-63.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from jax import lax

__all__ = ["ssim"]


@functools.lru_cache(maxsize=None)
def _window(window_size: int = 11, sigma: float = 1.5):
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    w2 = np.outer(g, g)
    w2.setflags(write=False)
    return w2


def _filter(x, w2, channel):
    # depthwise conv, SAME zero padding (torch conv2d groups=channel).
    # precision=HIGHEST: on TPU the default conv precision multiplies in
    # bfloat16, and the variance terms below are tiny differences of large
    # windowed moments -- bf16 products make s1+s2 land below -c2 in flat
    # regions, blowing the SSIM map past 1. Full-f32 MXU passes cost
    # nothing at metric sizes and keep the map in [-1, 1].
    k = w2.shape[0]
    w = jnp.asarray(w2)[None, None].repeat(channel, axis=0)
    return lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=channel,
        precision=lax.Precision.HIGHEST)


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    c = img1.shape[1]
    w2 = _window(window_size)
    mu1 = _filter(img1, w2, c)
    mu2 = _filter(img2, w2, c)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter(img1 * img1, w2, c) - mu1_sq
    s2 = _filter(img2 * img2, w2, c) - mu2_sq
    s12 = _filter(img1 * img2, w2, c) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1)
                                              * (s1 + s2 + c2))
    return jnp.mean(m) if size_average else jnp.mean(m, axis=(1, 2, 3))
