"""Pallas TPU kernel: assemble the scan codec's skew window in VMEM.

`window_mode="pallas"` builds the whole (B, npart, h+4, T, CC) per-layer
window of `codec/wavefront_scan.py` in ONE kernel instead of XLA gathers.
The flat layer buffer (B, Sbuf, CC) is block-fetched into VMEM ONCE per
image (the block index is constant across the npart grid dim, so pallas's
pipeline fetches it a single time per bi) -- at the flagship config the
interior rows + pad rows together re-read ~the whole buffer anyway, so
whole-buffer residency costs the same HBM traffic as targeted row DMAs
and sidesteps every Mosaic DMA-slice alignment rule (sublane starts AND
lengths must be 8-aligned, lane lengths 128-aligned: three successive
on-chip rejections, demo/ab/r5_pallas_ab_512*.log).

  * interior rows (h per band): for a fixed (band, row) the window
    positions are consecutive buffer columns (the burst decomposition,
    `ScanWavefrontCodec._burst_setup`), so each row is ONE (T, CC) slice
    of VMEM at a z-dependent row offset -- read 8-aligned (pl.multiple_of)
    with a slightly longer run and realigned by a one-hot f32 matmul on
    the MXU (an exact copy), masked to the valid column range, with the
    <=6 non-identity columns patched from precomputed (XLA-side) values.
  * vertical-pad rows (4 per band): each (band, pad-row, tap) provably
    reads ONE source plane row (`_mmpad_tables` audit), sliced the same
    aligned way and contracted with a one-hot-times-lerp-weight selection
    matrix -- the MXU does the column remap (the alignment residue folds
    into the selection compare).

The values are exactly the gather path's (copies, single exact products,
and same-order bf16 adds), so coder ranges match the gather profile
bit-for-bit (tested); the executable profile is still recorded in the
stream container (FLAG2_PALLASWIN).

On non-TPU backends the kernel runs in interpreter mode (tests); the
compiled path is TPU-only. Reference behavior covered: the window half of
`extension/entropy_conv_cuda_v2.cu`'s frontier compute (per-step causal
context fetch), re-expressed for the TPU memory system.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic requires dynamic sublane offsets to be PROVABLY tile-aligned
# (8 rows); burst starts are arbitrary per-step row offsets.  Every read
# therefore covers an ALIGNED, slightly longer run and the kernel
# realigns in VMEM:
#  * interior rows: a one-hot (T, ext) selection matmul (MXU) -- an exact
#    f32 copy of the T wanted rows, same trick the pad rows already use;
#  * pad rows: the residue is folded into the existing column-selection
#    compare (colz + rem).
_ALIGN = 8


def _ext_rows(Sbuf, n, A=_ALIGN):
    """Extended read length for n-row slices of a Sbuf-row buffer:
    round_up(n, A) + A.  Sbuf must be a multiple of A (_burst_setup pads
    it) so the clamped max start Sbuf - ext stays aligned.  Then for any
    s in [0, Sbuf - n],
        astart = min((s // A) * A, Sbuf - ext)
    is A-aligned, astart + ext <= Sbuf, and rem = s - astart <= ext - n."""
    assert Sbuf % A == 0, Sbuf
    ext = (n + A - 1) // A * A + A
    assert Sbuf >= ext, (Sbuf, n)
    return ext


def _aligned_start(s, ext, Sbuf, A=_ALIGN):
    astart = jnp.minimum((s // A) * A, Sbuf - ext)
    return pl.multiple_of(astart, A)


def _window_kernel(h, T, w, CC, npart, Sbuf, extT, extW,
                   starts_ref, pstarts_ref, j0_ref, tpos_ref,   # SMEM
                   buf_ref, v6_ref, colz_ref, wz_ref,           # inputs
                   win_ref):                                    # output
    b = pl.program_id(1)

    def row_slice(s, ext):
        """(ext, CC) aligned VMEM read + the realignment residue."""
        astart = _aligned_start(s, ext, Sbuf)
        return buf_ref[0, pl.ds(astart, ext), :], s - astart

    # ---- vertical-pad rows: one single-source-row read per (k, tap) ----
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, extW), 1)
    acc = None
    for idx in range(8):
        k, tap = idx // 2, idx % 2
        src, rem = row_slice(pstarts_ref[b, k, tap], extW)
        colz = colz_ref[0, k, tap, :]                   # (T,)
        wz = wz_ref[0, k, tap, :]                       # (T,)
        # build the selection mask in f32: Mosaic only supports non-no-op
        # minor-dim insertion (wz[:, None]) for 32-bit types, and the
        # round trip bf16 -> f32 -> bf16 is exact, so the downcast mask is
        # bit-identical to one built in bf16 directly.  The aligned-read
        # residue shifts the selected source row: wanted row colz[t] of
        # the exact run == row colz[t] + rem of the extended run.
        m = (((colz + rem)[:, None] == iota_w).astype(jnp.float32)
             * wz.astype(jnp.float32)[:, None]).astype(src.dtype)
        tapval = jnp.dot(m, src, preferred_element_type=jnp.float32
                         ).astype(src.dtype)            # (T, CC)
        if tap == 0:
            acc = tapval
        else:
            wrow = [0, 1, h + 2, h + 3][k]
            win_ref[0, 0, wrow] = acc + tapval

    # ---- interior rows: realign + mask + patch ----
    # NO i1 vectors survive past their producing compare: every mask is
    # converted to f32 at the compare's own layout and applied by
    # multiply-add. An i1 select whose mask replication differs from the
    # data operand's (the iota_tc compares are lane-replicated, v6[None, :]
    # is sublane-replicated) needs an i1 relayout Mosaic rejects (both the
    # round-4 A/B failure "16,{0,*}->(16,128)" and its 32-bit sibling);
    # f32 relayouts are fully supported, so all mixing happens in f32.
    # The realignment is a one-hot f32 matmul (exactly one unit product
    # per output position -> an exact copy of the upcast value), each
    # position then takes at most ONE add of an exactly-upcast value on a
    # zero/masked base, and mask*x == where(mask, x, 0) for finite x (the
    # -0.0 sign difference cannot survive the downstream adds), so the
    # single downcast per row is bit-identical to the gather path's bf16
    # adds (equivalence-tested).
    iota_tc = jax.lax.broadcasted_iota(jnp.int32, (T, CC), 0)
    iota_sel_r = jax.lax.broadcasted_iota(jnp.int32, (T, extT), 0)
    iota_sel_c = jax.lax.broadcasted_iota(jnp.int32, (T, extT), 1)
    for r in range(h):
        rows, rem = row_slice(starts_ref[b, r], extT)
        sel = (iota_sel_c - iota_sel_r == rem).astype(jnp.float32)
        row = jnp.dot(sel, rows.astype(jnp.float32),
                      preferred_element_type=jnp.float32)   # (T, CC) exact
        jj = iota_tc + j0_ref[b, r]                     # (T, CC)
        vmask = ((jj >= 0) & (jj < w)).astype(jnp.float32)
        val = vmask * row
        for k in range(6):
            pk = tpos_ref[b, r, k]
            val = val + ((iota_tc == pk).astype(jnp.float32)
                         * v6_ref[0, 0, r, k][None, :].astype(jnp.float32))
        win_ref[0, 0, 2 + r] = val.astype(win_ref.dtype)


def build_window_call(*, B, npart, h, w, T, CC, Sbuf, dtype, interpret):
    """Return f(starts, pstarts, j0, tpos, buf, v6, colz, wz) -> window.

    starts (npart, h) int32: interior run start ROW of band/row in the flat
    (Sbuf, CC) buffer; pstarts (npart, 4, 2) int32: pad source row starts;
    j0 (npart, h) int32: window-origin column (for the validity mask);
    tpos (npart, h, 6) int32: patch positions in t (out-of-range = no-op);
    buf (B, Sbuf, CC); v6 (B, npart, h, 6, CC) pre-weighted patch values;
    colz (npart, 4, 2, T) int32 / wz (npart, 4, 2, T) dtype: pad-row
    selection tables for step z. Returns (B, npart, h+4, T, CC).
    """
    extT = _ext_rows(Sbuf, T)
    extW = _ext_rows(Sbuf, w)
    kern = functools.partial(_window_kernel, h, T, w, CC, npart, Sbuf,
                             extT, extW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, npart),
        in_specs=[
            # whole buffer resident in VMEM; the block index is constant
            # across the npart grid dim so it is fetched once per bi
            pl.BlockSpec((1, Sbuf, CC), lambda bi, b, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),           # buf
            pl.BlockSpec((1, 1, h, 6, CC),
                         lambda bi, b, *_: (bi, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # v6
            pl.BlockSpec((1, 4, 2, T), lambda bi, b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # colz
            pl.BlockSpec((1, 4, 2, T), lambda bi, b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # wz
        ],
        out_specs=pl.BlockSpec((1, 1, h + 4, T, CC),
                               lambda bi, b, *_: (bi, b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, npart, h + 4, T, CC), dtype),
        interpret=interpret,
    )
