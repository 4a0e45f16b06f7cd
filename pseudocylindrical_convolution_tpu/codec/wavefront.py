"""Wavefront (anti-diagonal) coding schedule for the autoregressive decode.

A latent symbol at (global row i, column j, channel-group g) is coded at step
z = i + j + g. Within a step, symbols are ordered by diagonal ps = i + j
ascending (i.e. group descending) and row ascending -- exactly the order the
reference's DExtract2 emits them to the arithmetic coder
(extension/entropy_context_cuda.cu:23-39 builds the per-diagonal index,
extension/d_extract_cuda_v2.cu:33-106 walks the window [z-ngroup+1, z]).

The whole schedule is static per (geometry, h, w, ngroup); we precompute the
global symbol order once so the encoder can emit the entire stream with a
single host call.
"""

from __future__ import annotations

import functools

import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry


@functools.lru_cache(maxsize=None)
def wavefront_schedule(geom: Geometry, h: int, w: int, ngroup: int):
    """Returns (order, step_counts, nsteps).

    order: (nsym, 3) int32 rows (i, j, g) in exact coding order.
    step_counts: (nsteps,) int32 symbols per step;
    nsteps = h*npart + w + ngroup - 2.
    """
    npart = geom.npart
    h_out = h * npart
    hindex = geom.hindex(h_out, w)
    # cells per diagonal ps, ordered by row ascending
    diag_cells = []
    for ps in range(h_out + w - 1):
        cells = []
        for i in range(h_out):
            j = ps - i
            if 0 <= j < int(hindex[i // h]):
                cells.append((i, j))
        diag_cells.append(cells)
    nsteps = h_out + w + ngroup - 2
    order = []
    counts = np.zeros(nsteps, dtype=np.int32)
    for z in range(nsteps):
        st = max(z - ngroup + 1, 0)
        end = min(z + 1, h_out + w - 1)
        cnt = 0
        for ps in range(st, end):
            g = z - ps
            for (i, j) in diag_cells[ps]:
                order.append((i, j, g))
                cnt += 1
        counts[z] = cnt
    order = np.asarray(order, dtype=np.int32).reshape(-1, 3)
    order.setflags(write=False)
    counts.setflags(write=False)
    return order, counts, nsteps


@functools.lru_cache(maxsize=None)
def symbol_gather_index(geom: Geometry, h: int, w: int, ngroup: int):
    """Flat indices into a (npart, ngroup, h, w) tensor, in coding order."""
    order, _, _ = wavefront_schedule(geom, h, w, ngroup)
    i, j, g = order[:, 0], order[:, 1], order[:, 2]
    band, r = i // h, i % h
    flat = ((band * ngroup + g) * h + r) * w + j
    flat = flat.astype(np.int32)
    flat.setflags(write=False)
    return flat
