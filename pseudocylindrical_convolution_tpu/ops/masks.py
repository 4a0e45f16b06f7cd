"""Causal weight masks for the grouped entropy convolutions.

Behavioral reference: extension/mask_constrain_cuda.cu:18-88. The mask is a
static multiplier on the conv weights (the reference zeroes weights in place
each step; multiplying before the conv is equivalent and functional).

For weights (nout_total, cin_total, k, k) with nout_total = ngroup*group_out
and cin_total = ngroup*group_in, tap (kh, kw) from input group gi into output
group go is kept when:
  v5 (input layer, strict):   kw + kh + gi <  go + k - 1
  v6 (hidden, inclusive):     kw + kh + gi <= go + k - 1
which in wavefront coordinates z = row+col+group means z_in < z_out (v5) /
z_in <= z_out (v6).
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["conv_mask"]


@functools.lru_cache(maxsize=None)
def conv_mask(version: int, nout: int, cin: int, ksize: int, ngroup: int):
    group_in = cin // ngroup
    group_out = nout // ngroup
    kw = np.arange(ksize)[None, None, None, :]
    kh = np.arange(ksize)[None, None, :, None]
    gi = (np.arange(cin) // group_in)[None, :, None, None]
    go = (np.arange(nout) // group_out)[:, None, None, None]
    if version == 5:
        keep = kw + kh + gi < go + ksize - 1
    elif version == 6:
        keep = kw + kh + gi <= go + ksize - 1
    elif version in (1, 2):
        # classic PixelCNN masks (mask_constrain_cuda.cu:18-61):
        # keep when go > gi; zero when go < gi; on the diagonal keep strictly
        # earlier raster taps (v1 excludes the center column, v2 includes it).
        half = ksize // 2
        center_keep = kw < half if version == 1 else kw <= half
        keep = (go > gi) | ((go == gi) & ((kh < half) | ((kh == half) & center_keep)))
    else:
        raise ValueError(f"unknown mask version {version}")
    m = np.broadcast_to(keep, (nout, cin, ksize, ksize)).astype(np.float32).copy()
    m.setflags(write=False)
    return m
