"""SphereSlice / SphereUslice: ERP <-> latitude-tiled repacking.

Per band, rows are a plain reshape (equal band heights); columns are
resampled with a 4-tap Catmull-Rom filter between the full width W and the
band's valid width hindex[g], with circular wrap at the seam.

Behavioral reference: extension/sphere_slice_cuda.cu:12-32,86-116 (slice) and
extension/sphere_uslice_cuda.cu:12-30,72-99 (uslice). The reference's
atomic-scatter backward tables are unnecessary here: both ops are 4-tap
gathers whose transpose JAX derives automatically. (The reference's
`interp_type` constructor arg selects nothing -- only the Catmull-Rom path
exists in its kernels -- so it is not reproduced.)
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry

__all__ = ["sphere_slice", "sphere_uslice"]


def _catmull_rom(t: np.float32):
    t = float(t)
    t2, t3 = t * t, t * t * t
    return ((-t + 2 * t2 - t3) / 2, (2 - 5 * t2 + 3 * t3) / 2,
            (t + 4 * t2 - 3 * t3) / 2, (-t2 + t3) / 2)


@functools.lru_cache(maxsize=None)
def _slice_tables(geom: Geometry, width: int):
    """Per-band column resample tables W -> hindex[g].

    Returns idx (npart, W, 4) int32 source columns and w (npart, W, 4)
    float32 weights; columns >= hindex[g] have zero weight.
    (init_slice_param_kernel, sphere_slice_cuda.cu:12-32.)
    """
    npart = geom.npart
    hindex = geom.hindex(npart, width)  # any h works: absolute-width profile
    idx = np.zeros((npart, width, 4), dtype=np.int64)
    wgt = np.zeros((npart, width, 4), dtype=np.float64)
    for g in range(npart):
        tw = int(hindex[g])
        for ti in range(tw):
            nidx = np.float32((ti + 0.5) / tw * width - 0.5 + 1e-9)
            if nidx < 0:
                nidx = np.float32(nidx + width)
            pw = int(nidx)
            cs = _catmull_rom(np.float32(nidx - np.float32(pw)))
            for k in range(4):
                idx[g, ti, k] = (pw - 1 + k + width) % width
                wgt[g, ti, k] = cs[k]
    return idx.astype(np.int32), wgt.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _uslice_tables(geom: Geometry, width: int):
    """Per-band column resample tables hindex[g] -> W, wrap within hindex[g].

    (init_uslice_param_kernel, sphere_uslice_cuda.cu:12-30.)
    """
    npart = geom.npart
    hindex = geom.hindex(npart, width)
    idx = np.zeros((npart, width, 4), dtype=np.int64)
    wgt = np.zeros((npart, width, 4), dtype=np.float64)
    for g in range(npart):
        wl = int(hindex[g])
        for ti in range(width):
            nidx = np.float32((ti + 0.5) / width * wl - 0.5 + 1e-9)
            if nidx < 0:
                nidx = np.float32(nidx + wl)
            pw = int(nidx)
            cs = _catmull_rom(np.float32(nidx - np.float32(pw)))
            for k in range(4):
                idx[g, ti, k] = (pw - 1 + k + wl) % wl
                wgt[g, ti, k] = cs[k]
    return idx.astype(np.int32), wgt.astype(np.float32)


def sphere_slice(x, geom: Geometry):
    """ERP (N, C, H, W) -> tiles (N*npart, C, H//npart, W).

    Columns past each band's valid width are zero.
    """
    n, c, hfull, w = x.shape
    npart = geom.npart
    assert hfull % npart == 0
    h = hfull // npart
    idx, wgt = _slice_tables(geom, w)
    x5 = x.reshape(n, c, npart, h, w)
    out = jnp.zeros_like(x5)
    for k in range(4):
        # take along the column axis with per-band indices (broadcast over h)
        ik = jnp.asarray(idx[:, :, k])[None, None, :, None, :]
        tk = jnp.take_along_axis(x5, ik, axis=-1)
        out = out + tk * wgt[None, None, :, None, :, k]
    return out.transpose(0, 2, 1, 3, 4).reshape(n * npart, c, h, w)


def sphere_uslice(x, geom: Geometry):
    """Tiles (N*npart, C, h, W) -> ERP (N, C, h*npart, W)."""
    nb, c, h, w = x.shape
    npart = geom.npart
    n = nb // npart
    idx, wgt = _uslice_tables(geom, w)
    x5 = x.reshape(n, npart, c, h, w).transpose(0, 2, 1, 3, 4)  # (n,c,p,h,w)
    out = jnp.zeros_like(x5)
    for k in range(4):
        ik = jnp.asarray(idx[:, :, k])[None, None, :, None, :]
        tk = jnp.take_along_axis(x5, ik, axis=-1)
        out = out + tk * wgt[None, None, :, None, :, k]
    return out.reshape(n, c, npart * h, w)
