"""Static band geometry for pseudocylindrical (latitude-tiled) tensors.

An equirectangular (ERP) image of shape (H, W) is split into ``npart``
horizontal latitude bands. Each band g is horizontally resampled to a
latitude-dependent "valid width" ``hindex[g] <= W``; all tensors keep the
full width W with zeros beyond the valid region so shapes stay static and
XLA-friendly.

Behavioral reference (CUDA):
  - width profile: /root/reference/PCONV_operator/base.py:5-35 (set_weight)
  - valid widths:  /root/reference/extension/math_cuda.cu:223-253
    (sphere_cal_npart_hw_v3) and :177-221 (v2, also returns row split)

Everything here is plain numpy executed at trace time; results are cached
per configuration so jitted functions see only static constants.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import numpy as np
import scipy.interpolate

# Default 32-entry width profile (quarter-widths out of 64), identical to the
# hard-coded fallback in the reference (PCONV_operator/base.py:10).
DEFAULT_PROFILE = (
    8, 18, 24, 36, 46, 58, 62, 62, 62, 62, 63, 63, 63, 63, 63, 63,
    63, 63, 63, 63, 63, 63, 62, 62, 62, 62, 58, 46, 36, 24, 18, 8,
)


def load_profile(config_file: str = "./config/param.txt") -> tuple:
    """Load the 32-entry width profile, falling back to DEFAULT_PROFILE.

    Mirrors load_param (reference PCONV_operator/base.py:5-11): one line of
    comma-separated ints.
    """
    if config_file and os.path.exists(config_file):
        with open(config_file) as f:
            line = f.readline().rstrip("\n")
        return tuple(int(p) for p in line.split(","))
    return DEFAULT_PROFILE


def set_weight(npart: int, opt: bool = False, merge: bool = False,
               config_file: str = "./config/param.txt") -> tuple:
    """Per-band width weights; exact port of set_weight (base.py:13-35).

    With opt=True the 32-entry profile (+1) is PCHIP-interpolated onto a
    cos-latitude axis for ``npart`` bands, separately for each hemisphere.
    With opt=False a pure cosine profile (scaled to 64) is used. The returned
    weights are "absolute" quarter-widths: valid width = round(w/64 * W).
    """
    assert npart % 2 == 0, "npart should be a multiple of 2"
    tnpart = npart * 2 if merge else npart
    if opt:
        vlist = load_profile(config_file)
        y = np.array([p + 1 for p in vlist], dtype=np.float64)
        x = np.cos((0.5 - (np.arange(32.0) + 0.5) / 32) * np.pi)
        xt = np.cos((0.5 - (np.arange(tnpart) + 0.5) / tnpart) * np.pi)
        hp = tnpart // 2
        yt_a = np.ceil(scipy.interpolate.pchip_interpolate(x[:16], y[:16], xt[:hp]))
        yt_b = np.ceil(
            scipy.interpolate.pchip_interpolate(x[16:][::-1], y[16:][::-1], xt[hp:]))
        rlist = yt_a.tolist() + yt_b.tolist()
    else:
        ya = np.ceil(np.cos((0.5 - (np.arange(tnpart) + 0.5) / tnpart) * np.pi) * 64.0)
        rlist = ya.tolist()
    if merge:
        rlist = [max(rlist[2 * i], rlist[2 * i + 1]) for i in range(tnpart // 2)]
    return tuple(float(v) for v in rlist)


def band_widths(h_out: int, width: int, npart: int, weight: tuple) -> np.ndarray:
    """Valid width per band; port of sphere_cal_npart_hw_v3 (math_cuda.cu:223-253).

    h_out is the total tiled height (rows across all bands). When the weight
    profile sums past 3*npart (always true for the shipped profiles) weights
    are absolute quarter-widths: hindex[g] = round(weight[g]/64 * width),
    computed in float32 to match the CUDA kernel's arithmetic.
    """
    assert h_out % npart == 0, "height must be a multiple of npart"
    w32 = np.asarray(weight, dtype=np.float32)
    if float(w32.sum()) > 3 * npart:
        vals = w32 / np.float32(64.0) * np.float32(width)
        return (vals + np.float32(0.5)).astype(np.int32)
    # Legacy cosine path (weights are fractions of the cos profile).
    hpp = h_out // npart
    tidx = np.zeros(npart, dtype=np.int32)
    pi = math.acos(-1.0)
    half = npart // 2
    if npart % 2 == 0:
        for i in range(half - 1):
            tidx[i] = int(w32[i] * width *
                          math.cos(((hpp * (i + 1) - 0.5) / h_out - 0.5) * pi) + 0.5)
        tidx[half - 1] = width
        tidx[half] = width
        for i in range(half + 1, npart):
            tidx[i] = int(w32[i] * width *
                          math.cos(((hpp * i + 0.5) / h_out - 0.5) * pi) + 0.5)
    else:
        for i in range(half):
            tidx[i] = int(w32[i] * width *
                          math.cos(((hpp * (i + 1) - 0.5) / h_out - 0.5) * pi) + 0.5)
        tidx[half] = width
        for i in range(half + 1, npart):
            tidx[i] = int(w32[i] * width *
                          math.cos(((hpp * i + 0.5) / h_out - 0.5) * pi) + 0.5)
    return tidx


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Immutable, hashable band-geometry configuration.

    All derived index tables are cached per (geometry, shape) so that model
    code can freely call the accessors at trace time.
    """

    npart: int = 16
    opt: bool = True
    weight: tuple = None  # resolved in __post_init__
    # like the reference, an optional ./config/param.txt overrides the
    # width profile (PCONV_operator/base.py:5-11)
    config_file: str = "./config/param.txt"

    def __post_init__(self):
        if self.weight is None:
            object.__setattr__(
                self, "weight",
                set_weight(self.npart, self.opt, config_file=self.config_file))

    def hindex(self, h_out: int, width: int) -> np.ndarray:
        """Valid width per band for a tiled tensor of total height h_out."""
        return _hindex_cached(self, h_out, width)

    def valid_mask(self, h: int, width: int) -> np.ndarray:
        """(npart, h, width) float32 mask: 1 inside the valid region."""
        return _valid_mask_cached(self, h, width)


@functools.lru_cache(maxsize=None)
def _hindex_cached(geom: Geometry, h_out: int, width: int) -> np.ndarray:
    a = band_widths(h_out, width, geom.npart, geom.weight)
    a.setflags(write=False)
    return a


@functools.lru_cache(maxsize=None)
def _valid_mask_cached(geom: Geometry, h: int, width: int) -> np.ndarray:
    hindex = _hindex_cached(geom, h * geom.npart, width)
    cols = np.arange(width)[None, :]
    m = (cols < hindex[:, None]).astype(np.float32)  # (npart, width)
    m = np.broadcast_to(m[:, None, :], (geom.npart, h, width)).copy()
    m.setflags(write=False)
    return m
