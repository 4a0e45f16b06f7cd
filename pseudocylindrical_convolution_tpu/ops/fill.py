"""pseudo_fill: reset everything outside the valid band region.

Behavioral reference: extension/pseudo_fill_cuda.cu:27-43. Pure masking --
the transpose (zero gradients outside the region) falls out of autodiff.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry

__all__ = ["pseudo_fill"]


@functools.lru_cache(maxsize=None)
def _fill_mask(geom: Geometry, h: int, width: int, pad: int, trim: int):
    # The reference computes hindex at the tensor's own (height, width)
    # (pseudo_fill_cuda.cu:11-25); the absolute-width profile only uses width.
    hindex = geom.hindex(h * geom.npart, width)
    rows = np.arange(h)
    cols = np.arange(width)
    row_ok = (rows >= pad - trim) & (rows < h - pad + trim)
    col_ok = (cols[None, :] >= pad - trim) & (
        cols[None, :] < pad + hindex[:, None] + trim)
    m = (row_ok[None, :, None] & col_ok[:, None, :]).astype(np.float32)
    m.setflags(write=False)
    return m  # (npart, h, width)


def pseudo_fill(x, geom: Geometry, pad: int = 0, trim: int = 0,
                fvalue: float = 0.0):
    """(N*npart, C, h, W): set cells outside the valid region to fvalue."""
    nb, c, h, w = x.shape
    m = _fill_mask(geom, h, w, pad, trim)
    mask = jnp.asarray(m).reshape(1, geom.npart, 1, h, w)
    x5 = x.reshape(-1, geom.npart, c, h, w)
    if fvalue == 0.0:
        out = x5 * mask
    else:
        out = x5 * mask + (1.0 - mask) * fvalue
    return out.reshape(nb, c, h, w)


def valid_mask(geom: Geometry, h: int, width: int):
    """(npart, h, width) float32 validity mask (pad=0, trim=0)."""
    return _fill_mask(geom, h, width, 0, 0)
