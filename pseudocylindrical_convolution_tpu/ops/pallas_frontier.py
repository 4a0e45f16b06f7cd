"""Pallas TPU kernel for the incremental wavefront frontier convolution.

Computes, for one layer and one wavefront step, the new frontier cells
  out[s, b, g, r, o] = sum_{c,kh,kw} W[s,g,o,c,kh,kw] *
                       slab[s, b, c, r+kh, (G+h-2) - g - r + kw]
from the causally-padded per-band slab (see codec/incremental.py). The XLA
formulation materializes skewed views of the slab in HBM (hundreds of MB per
step); here each grid program keeps its slab block in VMEM and walks the
per-group windows with dynamic slices, so HBM traffic is just slab + weights
+ outputs.

Grid: (subnets, bands, group-chunks). Each program computes a
(Gc, h, cout) output block from a (C, h+4, SW) slab block and a
(Gc, cout, C, 5, 5) weight block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["frontier_conv_pallas"]


def _kernel(slab_ref, w_ref, out_ref, *, G: int, Gc: int, h: int, cout: int,
            C: int):
    q0 = G + h - 2
    gc = pl.program_id(2)
    for gi in range(Gc):
        # window of slab columns covering all taps of group g
        wstart = q0 - (gc * Gc + gi) - h + 1
        wd = slab_ref[0, 0, :, :, pl.ds(wstart, h + 4)]   # (C, h+4, h+4)
        for r in range(h):
            patch = wd[:, r: r + 5, h - 1 - r: h - 1 - r + 5]
            flat = patch.reshape(1, C * 25)
            wmat = w_ref[0, gi].reshape(cout, C * 25)
            out_ref[0, 0, gi, r, :] = jnp.dot(
                wmat, flat[0], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnums=(2,))
def frontier_conv_pallas(slab, weights, interpret: bool = False):
    """slab: (3, npart, C, h+4, SW); weights: (3, G, cout, C, 5, 5).

    Returns (3, npart, G, h, cout). SW must equal G + h + 3.
    """
    S, npart, C, hp4, SW = slab.shape
    _, G, cout, _, _, _ = weights.shape
    h = hp4 - 4
    assert SW == G + h + 3, (SW, G, h)
    Gc = 8 if G % 8 == 0 else (4 if G % 4 == 0 else G)
    grid = (S, npart, G // Gc)
    kern = functools.partial(_kernel, G=G, Gc=Gc, h=h, cout=cout, C=C)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, C, hp4, SW), lambda s, b, gc: (s, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gc, cout, C, 5, 5),
                         lambda s, b, gc: (s, gc, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Gc, h, cout),
                               lambda s, b, gc: (s, b, gc, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, npart, G, h, cout), jnp.float32),
        interpret=interpret,
    )(slab, weights)
