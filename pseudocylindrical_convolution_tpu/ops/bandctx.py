"""Band context: global vs. device-local (halo-exchange) geometry ops.

The transform blocks (models/transform.py) only touch the sphere geometry
through three ops -- pseudo_pad, pseudo_fill, gdn. A ``BandCtx`` bundles
those three, so the same block code runs either

  * globally (``GlobalBands``): every device sees all ``npart`` latitude
    bands -- the plain single-device / data-parallel path; or
  * locally (``LocalBands``): inside a ``shard_map`` over a ('band',) mesh
    where each device owns a contiguous block of ``npart // ndev`` bands.

The only cross-band coupling in the whole transform stack is pseudo_pad's
vertical rows: band g's top/bottom pad interpolates the neighbouring band's
boundary rows (reference: extension/pseudo_context_cuda.cu:51-104 -- pole
rows reflect *within* the polar band itself, so the poles stay local).
``LocalBands.pad`` therefore exchanges exactly ``pad`` boundary rows with
each mesh neighbour via ``lax.ppermute`` (one hop on the ICI ring) and
gathers through per-device tables remapped into the local+halo row space.
This is the hand-tuned alternative to letting GSPMD insert halo collectives
around the global gather (parallel/spatial.py): the communicated volume is
the theoretical minimum (2*pad rows per device per pad call) and the gather
never addresses remote memory.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.ops.fill import _fill_mask, pseudo_fill
from pseudocylindrical_convolution_tpu.ops.gdn import gdn_apply
from pseudocylindrical_convolution_tpu.ops.pad import (build_pad_tables,
                                                       pseudo_pad)

__all__ = ["BandCtx", "GlobalBands", "LocalBands", "as_band_ctx",
           "build_local_pad_tables"]


class BandCtx:
    """Interface the transform blocks program against."""

    geom: Geometry

    def pad(self, x, pad: int, causal: bool = False):
        raise NotImplementedError

    def fill(self, x, pad: int = 0, trim: int = 0, fvalue: float = 0.0):
        raise NotImplementedError

    def gdn(self, params, x, inverse: bool = False, dtype=None):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class GlobalBands(BandCtx):
    geom: Geometry

    def pad(self, x, pad, causal=False):
        return pseudo_pad(x, self.geom, pad, causal)

    def fill(self, x, pad=0, trim=0, fvalue=0.0):
        return pseudo_fill(x, self.geom, pad, trim, fvalue)

    def gdn(self, params, x, inverse=False, dtype=None):
        return gdn_apply(params, x, self.geom, inverse=inverse, dtype=dtype)


def as_band_ctx(geom_or_ctx) -> BandCtx:
    if isinstance(geom_or_ctx, BandCtx):
        return geom_or_ctx
    return GlobalBands(geom_or_ctx)


# ---------------------------------------------------------------------------
# Device-local ops (inside shard_map over a ('band',) mesh)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def build_local_pad_tables(geom: Geometry, h: int, width: int, pad: int,
                           ndev: int, causal: bool = False):
    """Per-device pad tables indexing the device-local [halo|own|halo] rows.

    Returns (idx, wgt) of shape (ndev, 2, nl, h+2p, W+2p); indices address a
    flattened ((nl*h + 2*pad) * width) buffer whose row r corresponds to
    global tile row (dev*nl*h - pad + r). Asserts that every nonzero-weight
    source falls inside that window, i.e. a single ppermute hop suffices.
    """
    npart = geom.npart
    assert npart % ndev == 0
    nl = npart // ndev
    idx, wgt = build_pad_tables(geom, h, width, pad, causal)
    h2, w2 = h + 2 * pad, width + 2 * pad
    size = (nl * h + 2 * pad) * width
    li = np.zeros((ndev, 2, nl, h2, w2), np.int32)
    lw = np.zeros((ndev, 2, nl, h2, w2), np.float32)
    for d in range(ndev):
        lo = d * nl
        gi = idx[:, lo:lo + nl].astype(np.int64)
        gw = wgt[:, lo:lo + nl]
        rel = gi - (lo * h - pad) * width
        ok = (gw == 0) | ((rel >= 0) & (rel < size))
        assert ok.all(), "pad source escapes the one-hop halo window"
        li[d] = np.where(gw == 0, 0, np.clip(rel, 0, size - 1))
        lw[d] = gw
    li.setflags(write=False)
    lw.setflags(write=False)
    return li, lw


@dataclasses.dataclass(frozen=True)
class LocalBands(BandCtx):
    """Ops for one device's contiguous band block inside shard_map.

    Assumes image batch N == 1 (single-image spatial parallelism): the local
    tensors are (nl, C, h, W) with nl = npart // ndev.
    """

    geom: Geometry
    ndev: int
    axis_name: str = "band"

    @property
    def nl(self) -> int:
        return self.geom.npart // self.ndev

    def _dev(self):
        return jax.lax.axis_index(self.axis_name)

    def pad(self, x, pad, causal=False):
        nl = self.nl
        nb, c, h, w = x.shape
        assert nb == nl, "LocalBands assumes batch == local band count"
        li, lw = build_local_pad_tables(self.geom, h, w, pad, self.ndev,
                                        causal)
        d = self._dev()
        idx = jax.lax.dynamic_index_in_dim(jnp.asarray(li), d, keepdims=False)
        wgt = jax.lax.dynamic_index_in_dim(jnp.asarray(lw), d, keepdims=False)
        # (nl, C, h, W) -> (C, nl*h, W) contiguous global rows of this block
        xr = x.transpose(1, 0, 2, 3).reshape(c, nl * h, w)
        halo_prev, halo_next = self._halo_rows(xr, pad)
        flat = jnp.concatenate([halo_prev, xr, halo_next], axis=1
                               ).reshape(c, -1)
        out = (jnp.take(flat, idx[0], axis=-1) * wgt[0]
               + jnp.take(flat, idx[1], axis=-1) * wgt[1])
        # out: (C, nl, h+2p, W+2p) -> (nl, C, h+2p, W+2p)
        return out.transpose(1, 0, 2, 3)

    def _halo_rows(self, xr, pad):
        """(halo_prev, halo_next): the `pad` global rows bordering this
        device's block, fetched from ring neighbours via ppermute.

        One hop moves a whole neighbouring block (nl*h rows); when
        pad > nl*h (tiny tiles on a wide mesh) additional hops accumulate
        further blocks. Ring-wrap content at the poles is never referenced
        (those table weights are zero / pole reflection is block-local)."""
        c, rows, w = xr.shape
        if self.ndev == 1:
            z = jnp.zeros((c, pad, w), xr.dtype)
            return z, z
        fwd = [(i, (i + 1) % self.ndev) for i in range(self.ndev)]
        bwd = [(i, (i - 1) % self.ndev) for i in range(self.ndev)]
        hops = -(-pad // rows)                        # ceil
        if hops == 1:
            halo_prev = jax.lax.ppermute(xr[:, -pad:], self.axis_name, fwd)
            halo_next = jax.lax.ppermute(xr[:, :pad], self.axis_name, bwd)
            return halo_prev, halo_next
        prev_blocks, next_blocks = [], []
        cur_p, cur_n = xr, xr
        for _ in range(min(hops, self.ndev)):
            cur_p = jax.lax.ppermute(cur_p, self.axis_name, fwd)
            cur_n = jax.lax.ppermute(cur_n, self.axis_name, bwd)
            prev_blocks.insert(0, cur_p)
            next_blocks.append(cur_n)
        halo_prev = jnp.concatenate(prev_blocks, axis=1)[:, -pad:]
        halo_next = jnp.concatenate(next_blocks, axis=1)[:, :pad]
        return halo_prev, halo_next

    def _local_mask(self, h, w, pad=0, trim=0):
        m = _fill_mask(self.geom, h, w, pad, trim)      # (npart, h, w)
        ml = np.reshape(m, (self.ndev, self.nl, h, w))
        return jax.lax.dynamic_index_in_dim(jnp.asarray(ml), self._dev(),
                                            keepdims=False)

    def fill(self, x, pad=0, trim=0, fvalue=0.0):
        nb, c, h, w = x.shape
        mask = self._local_mask(h, w, pad, trim)[:, None]
        if fvalue == 0.0:
            return x * mask
        return x * mask + (1.0 - mask) * fvalue

    def gdn(self, params, x, inverse=False, dtype=None):
        from pseudocylindrical_convolution_tpu.ops.gdn import (
            _BETA_BOUND, _GAMMA_BOUND, _PEDESTAL, lower_bound)
        nb, ch, h, w = x.shape
        mask = self._local_mask(h, w)[:, None]
        x = x * mask
        beta = lower_bound(params["beta"], _BETA_BOUND) ** 2 - _PEDESTAL
        gamma = lower_bound(params["gamma"], _GAMMA_BOUND) ** 2 - _PEDESTAL
        x2 = x * x
        if dtype is not None:
            x2 = x2.astype(dtype)
            gamma = gamma.astype(dtype)
        norm = jnp.einsum("nihw,oi->nohw", x2, gamma,
                          preferred_element_type=jnp.float32
                          ) + beta[None, :, None, None]
        norm = jnp.sqrt(norm)
        norm = norm * mask + (1.0 - mask)
        return x * norm if inverse else x / norm
