"""Slow, literal numpy simulations of the reference CUDA kernel semantics.

These are written as direct sequential translations of the kernel *behavior*
(element loops, in-place buffer updates) and serve as an independent oracle
for the vectorized gather/table implementations in the package. Citations
refer to files under /root/reference/extension/.
"""

from __future__ import annotations

import numpy as np

F = np.float32


def band_widths_ref(h_out, width, npart, weight):
    """sphere_cal_npart_hw_v3 (math_cuda.cu:223-253), absolute-width path."""
    w = np.asarray(weight, dtype=np.float32)
    assert float(w.sum()) > 3 * npart
    return np.array([int(F(wi) / F(64) * F(width) + 0.5) for wi in w],
                    dtype=np.int32)


def pseudo_pad_ref(x, hindex, pad, causal=False):
    """x: (npart, C, h, W) single image -> (npart, C, h+2p, W+2p).

    Sequential simulation of pseudo_pad.cu:38-124 (standard) /
    pseudo_entropy_pad_cuda.cu:38-133 (causal, context_version=1).
    """
    npart, C, h, W = x.shape
    H = h * npart
    out = np.zeros((npart, C, h + 2 * pad, W + 2 * pad), dtype=x.dtype)
    # kernel 1: interior copy, zero outside valid region
    for g in range(npart):
        wl = int(hindex[g])
        out[g, :, pad:pad + h, pad:pad + wl] = x[g, :, :, :wl]
    # kernel 2: vertical pad rows
    for g in range(npart):
        wl = int(hindex[g])
        for tl in range(2):
            for tp in range(pad):
                if tl == 0:
                    dr, ph = tp, g * h - pad + tp
                else:
                    dr, ph = pad + h + tp, (g + 1) * h + tp
                pole = ph < 0 or ph >= H
                for tw in range(wl):
                    if pole:
                        if causal:
                            continue  # stays zero
                        rph = -ph - 1 if ph < 0 else 2 * H - ph - 1
                        nw = tw + wl / 2.0
                        if nw >= wl:
                            nw -= wl
                        pg = rph // h
                        wp = int(hindex[pg])
                        pw = float(F(((nw + 0.5) / wl) * wp - 0.5 + 1e-9))
                        if pw < 0:
                            pw = float(F(pw + wp))
                        pi = int(pw)
                        t = float(F(pi + 1 - pw))
                        a = x[pg, :, rph % h, pi]
                        b = x[pg, :, rph % h, (pi + 1) % wp]
                        out[g, :, dr, pad + tw] = a * t + b * (1 - t)
                    else:
                        pg = ph // h
                        wp = int(hindex[pg])
                        pw = float(F(((tw + 0.5) / wl) * wp - 0.5 + 1e-9))
                        if causal:
                            pi = -1 if pw < 0 else int(pw)
                            if pi > tw:
                                val = np.zeros(C, dtype=x.dtype)
                            elif pi + 1 > tw:
                                val = x[pg, :, ph % h, pi]
                            else:
                                t = float(F(pi + 1 - pw))
                                if pi == -1:
                                    t = 0.0
                                    a = np.zeros(C, dtype=x.dtype)
                                else:
                                    a = x[pg, :, ph % h, pi]
                                b = x[pg, :, ph % h, (pi + 1) % wp]
                                val = a * t + b * (1 - t)
                            out[g, :, dr, pad + tw] = val
                        else:
                            if pw < 0:
                                pw = float(F(pw + wp))
                            pi = int(pw)
                            t = float(F(pi + 1 - pw))
                            a = x[pg, :, ph % h, pi]
                            b = x[pg, :, ph % h, (pi + 1) % wp]
                            out[g, :, dr, pad + tw] = a * t + b * (1 - t)
    # kernel 3: circular horizontal pad (reads the padded buffer in place)
    for g in range(npart):
        wl = int(hindex[g])
        for r in range(h + 2 * pad):
            for pwb in range(2):
                for pwa in range(pad):
                    qw = pwb * (wl + pad) + pwa
                    if causal and pwb == 0:
                        out[g, :, r, qw] = 0.0
                    else:
                        out[g, :, r, qw] = out[g, :, r, (qw - pad) % wl + pad]
    return out


def _catmull(t):
    t = float(t)
    t2, t3 = t * t, t ** 3
    return np.array([(-t + 2 * t2 - t3) / 2, (2 - 5 * t2 + 3 * t3) / 2,
                     (t + 4 * t2 - 3 * t3) / 2, (-t2 + t3) / 2])


def sphere_slice_ref(x, hindex, npart):
    """x: (N, C, H, W) -> (N*npart, C, H//npart, W); sphere_slice_cuda.cu."""
    N, C, H, W = x.shape
    h = H // npart
    out = np.zeros((N * npart, C, h, W), dtype=x.dtype)
    for g in range(npart):
        tw = int(hindex[g])
        for ti in range(tw):
            nidx = float(F((ti + 0.5) / tw * W - 0.5 + 1e-9))
            if nidx < 0:
                nidx += W
            pw = int(nidx)
            cs = _catmull(F(nidx - pw))
            cols = [(pw - 1 + k + W) % W for k in range(4)]
            for n in range(N):
                acc = np.zeros((C, h), dtype=np.float64)
                for k in range(4):
                    acc += cs[k] * x[n, :, g * h:(g + 1) * h, cols[k]]
                out[n * npart + g, :, :, ti] = acc
    return out


def sphere_uslice_ref(x, hindex, npart):
    """x: (N*npart, C, h, W) -> (N, C, h*npart, W); sphere_uslice_cuda.cu."""
    NB, C, h, W = x.shape
    N = NB // npart
    out = np.zeros((N, C, h * npart, W), dtype=x.dtype)
    for g in range(npart):
        wl = int(hindex[g])
        for ti in range(W):
            nidx = float(F((ti + 0.5) / W * wl - 0.5 + 1e-9))
            if nidx < 0:
                nidx += wl
            pw = int(nidx)
            cs = _catmull(F(nidx - pw))
            cols = [(pw - 1 + k + wl) % wl for k in range(4)]
            for n in range(N):
                acc = np.zeros((C, h), dtype=np.float64)
                for k in range(4):
                    acc += cs[k] * x[n * npart + g, :, :, cols[k]]
                out[n, :, g * h:(g + 1) * h, ti] = acc
    return out


def gmm_table_repair_ref(table):
    """entropy_gmm_table_check_kernel (entropy_gmm_table_cuda.cu:82-105)."""
    t = table.copy()
    n, m = t.shape
    ngroup = m - 1
    for r in range(n):
        bias = 0
        mval = 0
        midx = 0
        for i in range(ngroup):
            if t[r, i + 1] <= t[r, i]:
                bias += 1
            t[r, i + 1] += bias
            if t[r, i + 1] - t[r, i] > mval:
                mval = t[r, i + 1] - t[r, i]
                midx = i
        if bias > 0:
            for i in range(midx, ngroup):
                t[r, i + 1] -= bias
    return t
