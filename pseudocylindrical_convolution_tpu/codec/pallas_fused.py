"""Pallas TPU kernel: fused window-assembly + sheared frontier conv.

`window_mode="fused"` runs each layer-step of `codec/wavefront_scan.py` as
ONE kernel: the skew window is assembled in VMEM (the same aligned-read +
one-hot-realign decomposition as `pallas_window.py`) and the sheared conv
runs on the MXU directly from VMEM, so the (B, npart, h+4, T, CC) window
NEVER touches HBM (neither the write of an assembly pass nor the conv's
re-read, ~150 MB/step at the flagship config) and the conv's lhs transpose
disappears. Only the frontier cells (B, npart, h, cout3) leave the kernel.

Layout inside the kernel (per band): win (h+4, T, CC) in VMEM scratch.
The flat layer buffer is block-fetched into VMEM once per image (constant
block index; see pallas_window.py on why whole-buffer residency beats
Mosaic's DMA-slice alignment rules at equal HBM traffic) --
  * interior rows: one (extT, CC) aligned VMEM read each (burst
    decomposition, `ScanWavefrontCodec._burst_setup`), realigned by a
    one-hot f32 matmul, masked to the valid column range, the <=6
    non-identity columns patched from pre-weighted table values;
  * vertical-pad rows: 8 single-source-row reads contracted with one-hot
    selection matrices on the MXU (the `_mmpad_tables` audit guarantees
    one source row per (band, pad-row, tap)).
  * conv: 45 unrolled (dy, dx) taps; per (subnet, group-chunk) the tap is
    a (h, c, CI) x (CI, c*cpg) dot_general accumulated in fp32, and the
    per-group diagonal y = c-1-gg is selected in VMEM -- the same masked
    reduction as `_conv_cells`, never materialized to HBM. The kernel
    weights (45, CI, cout3) stay resident in VMEM across the whole grid
    (constant block index), so K streams from HBM once per layer-step
    instead of once per conv dispatch.

The values match the gather-mode conv (fp32 accumulation either way; the
(dy, dx) summation order differs, so coder ranges can drift ulps across
PROFILES -- irrelevant to decodability, which is per-executable; the
stream container records FLAG2_FUSEDSTEP). On non-TPU backends the kernel
runs in interpreter mode (tests).

Reference behavior covered: the fused per-step kernel
`extension/entropy_conv_cuda_v2.cu:60-110` (context fetch + masked conv in
one launch), re-expressed for the TPU memory system: VMEM residency +
MXU taps instead of warp-level shared-memory tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pseudocylindrical_convolution_tpu.codec.pallas_window import (
    _aligned_start, _ext_rows)


def _fused_kernel(h, T, w, CC, CI, cout3, G, nchunks, npart, unroll_taps,
                  Sbuf, extT, extW,
                  starts_ref, pstarts_ref, j0_ref, tpos_ref,   # SMEM
                  buf_ref, k_ref, v6_ref, colz_ref, wz_ref,    # inputs
                  out_ref,                                     # output
                  win):
    fg = CC // CI                    # 3 for hidden layers, 1 for the plane
    cout_full = cout3 // 3
    cpg = cout_full // G
    c = G // nchunks

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, extW), 1)
    iota_tc = jax.lax.broadcasted_iota(jnp.int32, (T, CC), 0)
    iota_sel_r = jax.lax.broadcasted_iota(jnp.int32, (T, extT), 0)
    iota_sel_c = jax.lax.broadcasted_iota(jnp.int32, (T, extT), 1)

    def row_slice(s, ext):
        astart = _aligned_start(s, ext, Sbuf)
        return buf_ref[0, pl.ds(astart, ext), :], s - astart

    def band_body(b, carry):
        # ---- vertical-pad rows: one aligned read per (k, tap) ----------
        acc_pad = None
        for idx in range(8):
            k, tap = idx // 2, idx % 2
            src, rem = row_slice(pstarts_ref[b, k, tap], extW)
            colz = colz_ref[pl.ds(b, 1), k, tap, :][0]  # (T,)
            wz = wz_ref[pl.ds(b, 1), k, tap, :][0]      # (T,)
            # f32 mask build: Mosaic rejects bf16 minor-dim insertion
            # (wz[:, None]); bf16 -> f32 -> bf16 is exact so the downcast
            # mask is bit-identical (see pallas_window._window_kernel);
            # the aligned-read residue shifts the selected source row
            m = (((colz + rem)[:, None] == iota_w).astype(jnp.float32)
                 * wz.astype(jnp.float32)[:, None]).astype(src.dtype)
            tapval = jnp.dot(m, src, preferred_element_type=jnp.float32
                             ).astype(src.dtype)        # (T, CC)
            if tap == 0:
                acc_pad = tapval
            else:
                wrow = [0, 1, h + 2, h + 3][k]
                win[wrow] = acc_pad + tapval

        # ---- interior rows: realign + mask + patch ----------------------
        # f32 multiply-masks converted at the compare's own layout, single
        # downcast per row: no i1 vector ever needs a relayout; the one-hot
        # realign matmul is an exact f32 copy (same argument as
        # pallas_window's kernel)
        for r in range(h):
            rows, rem = row_slice(starts_ref[b, r], extT)
            sel = (iota_sel_c - iota_sel_r == rem).astype(jnp.float32)
            row = jnp.dot(sel, rows.astype(jnp.float32),
                          preferred_element_type=jnp.float32)  # (T, CC)
            jj = iota_tc + j0_ref[b, r]                 # (T, CC)
            vmask = ((jj >= 0) & (jj < w)).astype(jnp.float32)
            val = vmask * row
            for kk in range(6):
                pk = tpos_ref[b, r, kk]
                val = val + ((iota_tc == pk).astype(jnp.float32)
                             * v6_ref[0, pl.ds(b, 1), r, kk][0][None, :]
                                 .astype(jnp.float32))
            win[2 + r] = val.astype(win.dtype)

        # ---- sheared conv: 45 MXU taps per (subnet, group-chunk) --------
        for kch in range(nchunks):
            g0 = kch * c
            t0 = G - g0 - c
            for s in range(3):
                cs0 = s * CI if fg == 3 else 0
                col0 = s * cout_full + g0 * cpg
                ncol = c * cpg

                def tap(i, dy, dx, acc, t0=t0, cs0=cs0, col0=col0,
                        ncol=ncol):
                    lhs = win[pl.ds(dx, h), pl.ds(t0 + dy, c),
                              pl.ds(cs0, CI)]           # (h, c, CI)
                    rhs = k_ref[pl.ds(i, 1), :, pl.ds(col0, ncol)][0]
                    return acc + jax.lax.dot_general(
                        lhs, rhs, (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                acc = jnp.zeros((h, c, ncol), jnp.float32)
                if unroll_taps:
                    # static (dy, dx): every win/K slice has compile-time
                    # offsets -- avoids Mosaic's dynamic unaligned
                    # sublane/lane slicing at the cost of code size
                    for i in range(45):
                        acc = tap(i, i // 5, i % 5, acc)
                else:
                    acc = jax.lax.fori_loop(
                        0, 45, lambda i, a: tap(i, i // 5, i % 5, a), acc)
                # per-group diagonal: output col u (group gg = u // cpg)
                # keeps y-slice c-1-gg (the _conv_cells masked reduction)
                ysel = jax.lax.broadcasted_iota(jnp.int32, (c, ncol), 0)
                gg = jax.lax.broadcasted_iota(jnp.int32, (c, ncol), 1) // cpg
                keep = (ysel == c - 1 - gg).astype(jnp.float32)
                cells = jnp.sum(acc * keep[None], axis=1)   # (h, ncol)
                out_ref[0, pl.ds(b, 1), :, pl.ds(col0, ncol)] = cells[None]
        return carry

    jax.lax.fori_loop(0, npart, band_body, 0)


def build_fused_conv_call(*, B, npart, h, w, T, CC, CI, cout3, nchunks,
                          Sbuf, dtype, interpret, unroll_taps=False):
    """Return f(starts, pstarts, j0, tpos, buf, K, v6, colz, wz) -> cells.

    starts/pstarts/j0/tpos: as `pallas_window.build_window_call`;
    buf (B, Sbuf, CC); K (45, CI, cout3) sheared subnet-fused kernel
    (CI = CC for the input plane, CC // 3 for hidden layers); v6
    (B, npart, h, 6, CC) pre-weighted patch values; colz/wz
    (npart, 4, 2, T) pad-row selection tables. Returns fp32 frontier
    cells (B, npart, h, cout3) -- bias/activation applied by the caller.
    """
    G = T - 8
    assert CC in (CI, 3 * CI) and G % nchunks == 0
    # the fori-loop tap variant reads win at a TRACED (dy, dx) offset on
    # the sublane dim, which Mosaic statically rejects ("cannot statically
    # prove that index in dimension 1 is a multiple of 8", on-chip A/B
    # demo/ab/r5_pallas_ab_512_fixed.log); on real TPU the taps must be
    # python-unrolled so every win/K slice has compile-time offsets.
    # Interpret mode keeps the compact fori form (faster to trace/test).
    if not interpret:
        unroll_taps = True
    extT = _ext_rows(Sbuf, T)
    extW = _ext_rows(Sbuf, w)
    kern = functools.partial(_fused_kernel, h, T, w, CC, CI, cout3, G,
                             nchunks, npart, unroll_taps, Sbuf, extT, extW)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B,),
        in_specs=[
            # whole buffer resident in VMEM (fetched once per bi; see
            # pallas_window.py)
            pl.BlockSpec((1, Sbuf, CC), lambda bi, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),            # buf
            pl.BlockSpec((45, CI, cout3), lambda bi, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),            # K (resident)
            pl.BlockSpec((1, npart, h, 6, CC),
                         lambda bi, *_: (bi, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # v6
            pl.BlockSpec((npart, 4, 2, T), lambda bi, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # colz
            pl.BlockSpec((npart, 4, 2, T), lambda bi, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # wz
        ],
        out_specs=pl.BlockSpec((1, npart, h, cout3),
                               lambda bi, *_: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h + 4, T, CC), dtype),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, npart, h, cout3), jnp.float32),
        interpret=interpret,
    )
