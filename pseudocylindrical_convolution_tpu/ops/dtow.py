"""Dtow: depth<->space pixel shuffle (reference extension/dtow_cuda.cu:37-74).

d2w: (N, C, H, W) -> (N, C/s^2, H*s, W*s) where channel c = pc*s^2 + rc maps
to output (pc, h*s + rc//s, w*s + rc%s) -- a pure reshape/transpose on TPU.
"""

from __future__ import annotations

__all__ = ["dtow"]


def dtow(x, stride: int = 2, d2w: bool = True):
    n, c, h, w = x.shape
    s = stride
    if d2w:
        assert c % (s * s) == 0
        x = x.reshape(n, c // (s * s), s, s, h, w)
        x = x.transpose(0, 1, 4, 2, 5, 3)          # n, c', h, s1, w, s2
        return x.reshape(n, c // (s * s), h * s, w * s)
    else:
        assert h % s == 0 and w % s == 0
        x = x.reshape(n, c, h // s, s, w // s, s)
        x = x.transpose(0, 1, 3, 5, 2, 4)          # n, c, s1, s2, h', w'
        return x.reshape(n, c * s * s, h // s, w // s)
