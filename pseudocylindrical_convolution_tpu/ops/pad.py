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

    Indices address the flattened (npart*h*width) input tensor. Fully
    vectorized numpy (the scalar per-pixel float32 math of the CUDA table
    kernels is reproduced with float32 array ops; the scalar-loop oracle
    lives in tests/reference_sim.py).
    """
    npart = geom.npart
    hindex = np.asarray(geom.hindex(h * npart, width), dtype=np.int64)
    h2, w2 = h + 2 * pad, width + 2 * pad
    idx = np.zeros((2, npart, h2, w2), dtype=np.int32)
    wgt = np.zeros((2, npart, h2, w2), dtype=np.float32)

    wl = hindex[:, None]                               # (npart, 1)
    tw = np.arange(width)[None, :]                     # (1, width)
    in_valid = tw < wl                                 # (npart, width)

    # 1) interior copy (pseudo_pad.cu:39-54): valid region only, rest zero.
    g3 = np.arange(npart, dtype=np.int32)[:, None, None]
    r3 = np.arange(h, dtype=np.int32)[None, :, None]
    c3 = np.arange(width, dtype=np.int32)[None, None, :]
    interior = (g3 * h + r3) * width + c3              # (npart, h, width)
    imask = c3 < wl[:, :, None]
    idx[0, :, pad:pad + h, pad:pad + width] = np.where(imask, interior, 0)
    wgt[0, :, pad:pad + h, pad:pad + width] = imask

    # 2) vertical pad rows via neighbour-band lerp (pseudo_pad.cu:57-79,
    #    tables pseudo_context_cuda.cu:51-104 / pseudo_entropy_context_cuda.cu
    #    v1 kernel :111-170). Vectorized over (band, column) per pad row.
    H_full = h * npart
    gcol = np.arange(npart)[:, None]

    def vertical_row(ph):
        """Tables for one pad row: ph (npart, 1) source global row index.

        Returns (i0, w0, i1, w1) each (npart, width); weights already
        masked to the valid column range."""
        i0 = np.zeros((npart, width), np.int64)
        w0 = np.zeros((npart, width), np.float64)
        i1 = np.zeros((npart, width), np.int64)
        w1 = np.zeros((npart, width), np.float64)
        pole = (ph < 0) | (ph >= H_full)               # (npart, 1)

        # --- non-pole: lerp from the neighbouring band ---
        phs = np.clip(ph, 0, H_full - 1)               # safe for pole rows
        pg = phs // h
        wp = hindex[pg[:, 0]][:, None]                 # (npart, 1)
        pw = ((tw + 0.5) / wl * wp - 0.5 + 1e-9).astype(np.float32)
        if causal:
            pidx = np.where(pw < 0, -1, pw.astype(np.int64))
            keep = pidx <= tw
            floor_only = (pidx + 1 > tw) & keep        # pidx == tw
            t32 = (pidx + 1).astype(np.float32) - pw
            t = np.where(pidx == -1, 0.0, t32.astype(np.float64))
            src0 = (pg * h + phs % h) * width + np.maximum(pidx, 0)
            src1 = (pg * h + phs % h) * width + (pidx + 1) % wp
            has0 = keep & ~floor_only & (pidx != -1)
            i0[:] = np.where(floor_only, src0, np.where(has0, src0, 0))
            w0[:] = np.where(floor_only, 1.0, np.where(has0, t, 0.0))
            has1 = keep & ~floor_only
            i1[:] = np.where(has1, src1, 0)
            w1[:] = np.where(has1, 1.0 - t, 0.0)
        else:
            pw = np.where(pw < 0, pw + wp.astype(np.float32), pw)
            pidx = pw.astype(np.int64)
            t = ((pidx + 1).astype(np.float32) - pw).astype(np.float64)
            i0[:] = (pg * h + phs % h) * width + pidx
            w0[:] = t
            i1[:] = (pg * h + phs % h) * width + (pidx + 1) % wp
            w1[:] = 1.0 - t

        # --- pole rows: reflect with a half-width shift (zero in causal) ---
        if causal:
            zero = pole & np.ones_like(in_valid)
            i0 = np.where(zero, 0, i0)
            w0 = np.where(zero, 0.0, w0)
            i1 = np.where(zero, 0, i1)
            w1 = np.where(zero, 0.0, w1)
        elif pole.any():
            rph = np.where(ph < 0, -ph - 1, 2 * H_full - ph - 1)
            nw = tw + wl / 2.0
            nw = np.where(nw >= wl, nw - wl, nw)
            pgp = rph // h
            wpp = hindex[np.clip(pgp[:, 0], 0, npart - 1)][:, None]
            pwp = ((nw + 0.5) / wl * wpp - 0.5 + 1e-9).astype(np.float32)
            pwp = np.where(pwp < 0, pwp + wpp.astype(np.float32), pwp)
            pidxp = pwp.astype(np.int64)
            tp_ = ((pidxp + 1).astype(np.float32) - pwp).astype(np.float64)
            src0p = (pgp * h + rph % h) * width + pidxp
            src1p = (pgp * h + rph % h) * width + (pidxp + 1) % wpp
            i0 = np.where(pole, src0p, i0)
            w0 = np.where(pole, tp_, w0)
            i1 = np.where(pole, src1p, i1)
            w1 = np.where(pole, 1.0 - tp_, w1)

        return (np.where(in_valid, i0, 0), np.where(in_valid, w0, 0.0),
                np.where(in_valid, i1, 0), np.where(in_valid, w1, 0.0))

    for tp in range(pad):
        i0, w0, i1, w1 = vertical_row(gcol * h - pad + tp)       # top rows
        idx[0, :, tp, pad:pad + width] = i0
        wgt[0, :, tp, pad:pad + width] = w0
        idx[1, :, tp, pad:pad + width] = i1
        wgt[1, :, tp, pad:pad + width] = w1
        i0, w0, i1, w1 = vertical_row((gcol + 1) * h + tp)       # bottom rows
        idx[0, :, pad + h + tp, pad:pad + width] = i0
        wgt[0, :, pad + h + tp, pad:pad + width] = w0
        idx[1, :, pad + h + tp, pad:pad + width] = i1
        wgt[1, :, pad + h + tp, pad:pad + width] = w1

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
    """Pad a tiled tensor (N*npart, C, h, W) -> (N*npart, C, h+2p, W+2p).

    Hybrid evaluation (values identical to the pure 2-tap table gather,
    tested against the scalar oracle): the interior rows are a streaming
    validity-mask multiply plus per-band circular-wrap column fix-ups
    (iota-masked adds for the right wrap, a pad-column gather for the
    left), and only the 2*pad vertical-pad rows go through the 2-tap
    interpolation tables. The original formulation gathered every output
    element through the tables -- a minor-axis element gather over the
    whole (h+2p, W+2p) tensor, the dominant non-conv cost of the
    transform stack on TPU."""
    npart = geom.npart
    nb, c, h, w = x.shape
    n = nb // npart
    w2 = w + 2 * pad
    idx, wgt = build_pad_tables(geom, h, w, pad, causal)
    hindex = np.asarray(geom.hindex(h * npart, w), np.int64)
    xg = x.reshape(n, npart, c, h, w)

    # --- interior rows ---
    imask = (np.arange(w)[None, :] < hindex[:, None])      # (npart, w)
    xv = xg * jnp.asarray(imask, x.dtype)[None, :, None, None, :]
    if causal:
        left = jnp.zeros((n, npart, c, h, pad), x.dtype)
    else:
        lcols = (hindex[:, None] - pad + np.arange(pad)[None, :]) % hindex[
            :, None]                                        # (npart, pad)
        left = jnp.take_along_axis(
            xv, jnp.asarray(lcols)[None, :, None, None, :], axis=-1)
    core = jnp.concatenate(
        [left, xv, jnp.zeros((n, npart, c, h, pad), x.dtype)], axis=-1)
    # right circular wrap: out col pad + hindex + d takes column d
    col2 = np.arange(w2)[None, :]
    for d in range(pad):
        m = jnp.asarray(col2 == (pad + hindex[:, None] + d),
                        x.dtype)[None, :, None, None, :]
        core = core + m * xv[..., d:d + 1]

    # --- vertical pad rows via the 2-tap tables (rows only) ---
    prow = np.r_[0:pad, pad + h:2 * pad + h]
    xf = xg.transpose(0, 2, 1, 3, 4).reshape(n, c, -1)
    pi, pw = idx[:, :, prow], wgt[:, :, prow]
    rows = (jnp.take(xf, pi[0], axis=-1) * pw[0]
            + jnp.take(xf, pi[1], axis=-1) * pw[1])
    rows = rows.transpose(0, 2, 1, 3, 4)       # (n, npart, c, 2p, w2)

    out = jnp.concatenate([rows[:, :, :, :pad], core,
                           rows[:, :, :, pad:]], axis=3)
    return out.reshape(nb, c, h + 2 * pad, w2)
