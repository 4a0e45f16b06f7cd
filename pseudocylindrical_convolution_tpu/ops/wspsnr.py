"""WS-PSNR: latitude-weighted PSNR over the full ERP image.

The standard 360-degree quality metric (Sun, Lu, Yu -- "Weighted-to-
Spherically-uniform quality evaluation", IEEE SPL 2017): every ERP pixel is
weighted by the solid angle it covers on the sphere, w(i) = cos((i + 0.5 -
H/2) * pi / H) for row i, constant over columns.  WS-PSNR =
10*log10(MAX^2 / WMSE) with WMSE = sum(w * (x - y)^2) / sum(w).

The reference repo never computes this (it evaluates on 14 projected
viewports only, pseudo_codec.py:263-290); BASELINE.md names WS-PSNR as the
north-star parity metric, so we provide it alongside the viewport metrics.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def erp_row_weights(height: int):
    """Per-row solid-angle weights for an ERP image: cos(latitude)."""
    i = np.arange(height, dtype=np.float64)
    return np.cos((i + 0.5 - height / 2.0) * np.pi / height).astype(
        np.float32)


def ws_mse(x, y):
    """Latitude-weighted MSE between two (..., C, H, W) ERP images."""
    h = x.shape[-2]
    w = jnp.asarray(erp_row_weights(h))[:, None]
    se = (x.astype(jnp.float32) - y.astype(jnp.float32)) ** 2
    return jnp.sum(se * w) / jnp.sum(jnp.broadcast_to(w, se.shape))


def ws_psnr(x, y, max_val: float = 1.0):
    """WS-PSNR in dB between two (..., C, H, W) ERP images in [0, max_val]."""
    m = ws_mse(x, y)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(m, 1e-12))
