"""pseudo_pad: latitude-aware padding of tiled tensors as a 2-tap gather.

Semantics replicated from the reference CUDA kernels:
  - standard mode: extension/pseudo_pad.cu:38-124 with interp tables from
    extension/pseudo_context_cuda.cu:51-104 (pole rows reflect with a 180deg
    shift; horizontal pad is circular within the valid width).
  - causal mode (train-time entropy context, context_version=1):
    extension/pseudo_entropy_pad_cuda.cu:38-133 with tables from
    extension/pseudo_entropy_context_cuda.cu:111-170 (pole rows are zero,
    vertical interp never reads columns right of the destination column,
    left circular pad is zero, right circular pad wraps to the row start).

TPU-first design: instead of the reference's three in-place kernels plus
cached inverse scatter tables for backward, the whole pad is two gathers with
static index/weight tables; the transpose (scatter-add) falls out of JAX
autodiff. Each output element is w0*x[i0] + w1*x[i1] over the flattened
(npart*h*W) input; weights of 0 encode "zero output".
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry

__all__ = ["pseudo_pad", "build_pad_tables"]


def _f32(x):
    return np.float32(x)


@functools.lru_cache(maxsize=None)
def build_pad_tables(geom: Geometry, h: int, width: int, pad: int,
                     causal: bool = False):
    """Build (idx, w): each (2, npart, h+2p, W+2p) for the 2-tap pad gather.

    Indices address the flattened (npart*h*width) input tensor.
    """
    npart = geom.npart
    hindex = geom.hindex(h * npart, width)
    h2, w2 = h + 2 * pad, width + 2 * pad
    idx = np.zeros((2, npart, h2, w2), dtype=np.int64)
    wgt = np.zeros((2, npart, h2, w2), dtype=np.float64)

    def src(g, r, c):
        return (g * h + r) * width + c

    # 1) interior copy (pseudo_pad.cu:39-54): valid region only, rest zero.
    for g in range(npart):
        wl = int(hindex[g])
        for r in range(h):
            for c in range(wl):
                idx[0, g, r + pad, c + pad] = src(g, r, c)
                wgt[0, g, r + pad, c + pad] = 1.0

    # 2) vertical pad rows via neighbour-band lerp (pseudo_pad.cu:57-79,
    #    tables pseudo_context_cuda.cu:51-104 / pseudo_entropy_context_cuda.cu
    #    v1 kernel :111-170).
    H_full = h * npart
    for g in range(npart):
        wl = int(hindex[g])
        for tl in range(2):            # 0: top pad rows, 1: bottom pad rows
            for tp in range(pad):
                dr = tp if tl == 0 else pad + h + tp
                ph = g * h - pad + tp if tl == 0 else (g + 1) * h + tp
                pole = ph < 0 or ph >= H_full
                for tw in range(wl):
                    dc = tw + pad
                    if pole:
                        if causal:
                            continue   # causal contexts zero the pole rows
                        rph = -ph - 1 if ph < 0 else 2 * H_full - ph - 1
                        nw = tw + wl / 2.0
                        if nw >= wl:
                            nw -= wl
                        pg = rph // h
                        wp = int(hindex[pg])
                        pw = _f32((nw + 0.5) / wl * wp - 0.5 + 1e-9)
                        if pw < 0:
                            pw = _f32(pw + wp)
                        pidx = int(pw)
                        t = float(_f32(pidx + 1 - pw))
                        idx[0, g, dr, dc] = src(pg, rph % h, pidx)
                        wgt[0, g, dr, dc] = t
                        idx[1, g, dr, dc] = src(pg, rph % h, (pidx + 1) % wp)
                        wgt[1, g, dr, dc] = 1.0 - t
                    else:
                        pg = ph // h
                        wp = int(hindex[pg])
                        pw = _f32((tw + 0.5) / wl * wp - 0.5 + 1e-9)
                        if causal:
                            pidx = -1 if pw < 0 else int(pw)
                            if pidx > tw:
                                continue          # fully future -> zero
                            elif pidx + 1 > tw:   # pidx == tw: floor tap only
                                idx[0, g, dr, dc] = src(pg, ph % h, pidx)
                                wgt[0, g, dr, dc] = 1.0
                            else:
                                t = float(_f32(pidx + 1 - pw))
                                if pidx == -1:
                                    t = 0.0
                                else:
                                    idx[0, g, dr, dc] = src(pg, ph % h, pidx)
                                    wgt[0, g, dr, dc] = t
                                idx[1, g, dr, dc] = src(pg, ph % h, (pidx + 1) % wp)
                                wgt[1, g, dr, dc] = 1.0 - t
                        else:
                            if pw < 0:
                                pw = _f32(pw + wp)
                            pidx = int(pw)
                            t = float(_f32(pidx + 1 - pw))
                            idx[0, g, dr, dc] = src(pg, ph % h, pidx)
                            wgt[0, g, dr, dc] = t
                            idx[1, g, dr, dc] = src(pg, ph % h, (pidx + 1) % wp)
                            wgt[1, g, dr, dc] = 1.0 - t

    # 3) circular horizontal pad composed in (pseudo_pad.cu:82-96 /
    #    pseudo_entropy_pad_cuda.cu:87-105): left pad wraps to the row end
    #    (zero in causal mode), right pad wraps to the row start. Compose by
    #    remapping output columns through the step-1/2 tables.
    for g in range(npart):
        wl = int(hindex[g])
        colmap = np.arange(w2)
        colw = np.ones(w2)
        for pwb in range(2):
            for pwa in range(pad):
                qw = pwb * (wl + pad) + pwa
                if causal and pwb == 0:
                    colw[qw] = 0.0
                else:
                    colmap[qw] = (qw - pad) % wl + pad
        idx[:, g] = idx[:, g][:, :, colmap]
        wgt[:, g] = wgt[:, g][:, :, colmap] * colw[None, None, :]

    iz = idx.astype(np.int32)
    wz = wgt.astype(np.float32)
    iz.setflags(write=False)
    wz.setflags(write=False)
    return iz, wz


def pseudo_pad(x, geom: Geometry, pad: int, causal: bool = False):
    """Pad a tiled tensor (N*npart, C, h, W) -> (N*npart, C, h+2p, W+2p)."""
    npart = geom.npart
    nb, c, h, w = x.shape
    n = nb // npart
    idx, wgt = build_pad_tables(geom, h, w, pad, causal)
    xf = x.reshape(n, npart, c, h * w).transpose(0, 2, 1, 3).reshape(n, c, -1)
    out = (jnp.take(xf, idx[0], axis=-1) * wgt[0]
           + jnp.take(xf, idx[1], axis=-1) * wgt[1])
    # out: (n, c, npart, h+2p, w+2p) -> (n*npart, c, h+2p, w+2p)
    return out.transpose(0, 2, 1, 3, 4).reshape(nb, c, h + 2 * pad, w + 2 * pad)
