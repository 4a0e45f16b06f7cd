"""ContextReshape: (N, G*cpg, H, W) -> (N*G*H*W, cpg) per-symbol rows.

Behavioral reference: extension/context_reshape_cuda.cu:29-41 --
row order is (n, group, h, w), columns are the cpg per-group channels.
"""

from __future__ import annotations

__all__ = ["context_reshape"]


def context_reshape(x, ngroup: int):
    n, c, h, w = x.shape
    cpg = c // ngroup
    y = x.reshape(n, ngroup, cpg, h * w)
    return y.transpose(0, 1, 3, 2).reshape(-1, cpg)
