"""Single-program wavefront codec: the whole image decodes in ONE dispatch.

The reference decodes sequentially with 13 kernel launches plus a host
arithmetic-coder sync per wavefront step (pseudo_codec.py:145-160,
extension/entropy_conv_cuda_v2.cu, entropy_ctx_pad_run2_cuda.cu). Round 1's
TPU port kept the host in the loop (one fused dispatch per step). This module
removes the host entirely: a `lax.scan` over the wavefront steps carries the
per-layer activation buffers, runs an incremental frontier network step, and
decodes the step's symbols with the on-device arithmetic decoder
(codec/device_ac.py) over L interleaved lanes. B images decode together in
one program (per-image math has no cross-batch reductions, so a stream
decodes identically in any slot of the B-shaped executable).

The frontier network step is a *skew-window convolution*: writing
y = global_row + col (anti-diagonal index), the step-z frontier of channel
group g is the single slice y = z - g, and a 5x5 tap (di, dj) into any
output cell of window slice yi reads input slice yi + di + dj at padded
row r + di -- independent of band, row, and input group. So one step of one
layer is ONE dense VALID convolution with a sheared 9x5 kernel
(K[.., dt, di] = W[.., di, dt-di]) over a (G+8, h+4) window gathered from
the flat activation buffer through the causal 2-tap pad tables. That keeps
the MXU contraction at full channel width (cout = G*cpn) instead of the
per-group 3-row matmuls a direct frontier gather produces.

Memory layout is channel-LAST and subnet-stacked ((B, S, 3C)) so the window
gather fetches contiguous 3C-sized rows (the TPU vector lane axis; all
three parameter subnets share one gather) instead of strided scalars, and
frontier write-back is a masked full-buffer add (iota == diag comparison
fused by XLA into one streaming pass) instead of an XLA scatter -- ablation
on a v5e chip showed the channel-major gather + scatter pair cost ~8 of the
12 ms/step (tools/prof_scan_ablate.py). Each layer's conv runs in
`conv_chunks` group chunks over sub-windows (cuts the sheared conv's G_y
redundancy ~chunks-fold; ARCHITECTURE.md §8 round-3 pass).

Bit-exactness is structural: the encoder teacher-forces the SAME compiled
program (a runtime mode flag selects symbol source via lax.cond; both modes
execute one executable), so encoder and decoder CDF tables are identical by
construction -- the property the reference gets from replaying identical
CUDA kernels, without its 238 sequential host round trips.

Stream format: L independent arithmetic-coder lanes; symbol i of step z goes
to lane i % L (coding order per codec/wavefront.py). Lane sizes are bounded
by 16 bits/symbol + 16 (AC redundancy bound with total=65536), making every
buffer shape static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig
from pseudocylindrical_convolution_tpu.codec import device_ac
from pseudocylindrical_convolution_tpu.codec.coder_bridge import encode_lanes
from pseudocylindrical_convolution_tpu.codec.incremental import (
    _static_tables, stack_step_weights)
from pseudocylindrical_convolution_tpu.codec.pipeline import (
    BIAS, NSTEP, TOTAL)
from pseudocylindrical_convolution_tpu.codec.wavefront import (
    wavefront_schedule)
from pseudocylindrical_convolution_tpu.ops.gmm_table import gmm_cdf_table


def _shear_kernel(w):
    """(..., cout, cin, 5, 5) -> (..., cout, cin, 9, 5) sheared kernel.

    K[..., dt, di] = W[..., di, dt - di] for 0 <= dt - di <= 4, else 0.
    """
    cols = []
    for di in range(5):
        col = w[..., di, :]                          # (..., 5) over dj
        col = jnp.pad(col, [(0, 0)] * (col.ndim - 1) + [(di, 4 - di)])
        cols.append(col)                             # (..., 9) over dt
    return jnp.stack(cols, axis=-1)                  # (..., 9, 5)


class ScanWavefrontCodec:
    """Batched single-dispatch wavefront encoder/decoder.

    B is part of the compiled executable (and of the stream header): a
    stream encodes/decodes bit-exactly in any slot of the B-shaped program.
    """

    def __init__(self, cfg: CMPNetConfig, geom: Geometry, h: int, w: int,
                 batch: int = 1, lanes: int = 64, cpn: int = 3,
                 num_gaussian: int = 3, dtype=jnp.bfloat16,
                 conv_chunks: int = 1, window_mode: str = "gather",
                 hoist: bool = False, pad_mode: str = "gather"):
        """dtype: activation-buffer dtype. bf16 (default) halves the window
        gather bytes (the measured per-step bottleneck); the conv still
        accumulates fp32 and the GMM/CDF math is fp32. Bit-exactness is
        per-executable either way (the stream header records the profile,
        container.FLAG_BF16).

        Layer buffers are flat channel-last, subnet-stacked (B, S, 3*C):
        one grouped conv per layer-step covers all three parameter subnets
        and the window gather fetches 3x-wider contiguous rows. Skewed
        layouts that turn the window gather / frontier write into dynamic
        slices were A/B'd on hardware and LOST (ARCHITECTURE.md §8
        ablation) -- XLA's masked streaming add is already free and
        dynamic slices on non-major axes hit slow paths."""
        self.cfg, self.geom, self.h, self.w = cfg, geom, h, w
        self.B, self.L = batch, lanes
        self.dtype = jnp.dtype(dtype)
        self.cpn, self.ng = cpn, num_gaussian
        # conv_chunks > 1 splits each layer conv into chunks of output
        # groups: chunk c of G/chunks groups only computes window slices
        # [G-g0-c, G-g0+8) (a (c+8)-slice sub-window of the one gathered
        # window), cutting the sheared conv's G_y redundancy ~chunks-fold
        # at the cost of `chunks` dispatches per layer. The chunking is an
        # executable-level choice (like dtype): encoder and decoder share
        # the program, so bit-exactness is unaffected, but streams are
        # decodable only by a same-profile executable.
        assert cfg.ngroup % conv_chunks == 0
        self.conv_chunks = conv_chunks
        # window_mode "slab": buffer rows are physically padded
        # (causal-left zeros, circular-wrap columns materialized at deposit
        # time), so the per-layer window is 16 contiguous dynamic slices
        # (one parallelogram slab per band + h static row shifts) instead
        # of a 7k-row gather; the 4 vertical-pad rows stay table gathers.
        # Executable-level profile like dtype/conv_chunks.
        # window_mode "burst": the interior window rows come from ONE
        # run-gather -- for a fixed (band, row) the window positions are
        # CONSECUTIVE buffer columns, so each (band, row) is a single
        # contiguous (T*CC)-element slice of the flat buffer (a "row burst";
        # npart*h big rows instead of npart*(h+4)*T small ones). Margins
        # carried inside the buffer keep every burst start in bounds; the
        # <=6 non-identity columns per row (causal-left zeros, the circular
        # wrap at the band's valid width, the right wrap) are patched from
        # the pad tables, and a static audit proves the decomposition
        # covers the table exactly (see _burst_setup).
        # window_mode "pallas": the whole per-layer window is assembled in
        # VMEM by one Pallas kernel (codec/pallas_window.py) -- interior
        # rows as contiguous run DMAs (the burst decomposition + margins),
        # vertical-pad rows as in-kernel one-hot MXU contractions against
        # single-source-row DMAs. Value-equal to the gather program.
        # window_mode "fused": one Pallas kernel per layer-step assembles
        # the window in VMEM AND runs the sheared conv from VMEM
        # (codec/pallas_fused.py): the window never reaches HBM, only the
        # frontier cells do; the layer kernel stays VMEM-resident across
        # all bands. conv_chunks selects the in-kernel group chunking.
        # "fusedu" = fused with the 45 conv taps python-unrolled (static
        # slice offsets for Mosaic instead of dynamic unaligned slices).
        assert window_mode in ("gather", "slab", "burst", "pallas",
                               "fused", "fusedu")
        self._fused_unroll = window_mode == "fusedu"
        if window_mode == "fusedu":
            window_mode = "fused"
        self.window_mode = window_mode
        # hoist: merge the input plane + 11 hidden buffers into ONE
        # (B, S, CCC) buffer and gather every layer's interior window rows
        # in a single stacked gather per step (rows 12x wider, 12x fewer);
        # same-step frontier cells are patched into the per-layer window
        # slices t = G+3-g (+ wrap aliases). Gather-mode only.
        assert not (hoist and window_mode in ("slab", "burst"))
        self.hoist = hoist
        # pad_mode "mm": the 4 vertical-pad window rows come from one-hot
        # selection MATMULS instead of 2-tap table gathers. Each (band,
        # pad-row, tap) provably reads a single source plane row (audited
        # in _mmpad_tables), so its T window values are
        # M (T, w) @ src_row (w, CC) with M a zero/weight one-hot built
        # per STEP from the pad tables (shared by all 12 layer calls via
        # XLA CSE): the pad half of the window moves from the
        # gather-row-bound path onto the MXU + contiguous row reads.
        # Value-equal to _pad_rows_g (single products, exact zero
        # addends), recorded in the stream profile (FLAG2_MMPAD) anyway.
        assert pad_mode in ("gather", "mm")
        assert not (pad_mode == "mm" and window_mode != "burst"), \
            "pad_mode='mm' composes with the burst interior only"
        assert not (window_mode in ("pallas", "fused")
                    and pad_mode != "gather"), \
            "pallas/fused window modes build their pad rows in-kernel"
        self.pad_mode = pad_mode
        G = cfg.ngroup
        npart = geom.npart
        self.G, self.npart = G, npart
        self.h_out = h * npart
        self.S = npart * h * w                       # per-channel plane size
        self.P = npart * G * h * w                   # symbol plane size
        self.SW_raw = (G + 8) + h - 1                # slab span (T + h - 1)
        self.SW = -(-self.SW_raw // 8) * 8           # dynamic-slice width
        self.LPAD = self.SW_raw
        wbuf = self.LPAD + w + self.SW + 2
        self.wbuf = -(-wbuf // 8) * 8
        # flat per-channel buffer length actually allocated
        self.Sbuf = (npart * h * self.wbuf if window_mode == "slab"
                     else self.S)

        order, counts, nsteps = wavefront_schedule(geom, h, w, G)
        self.counts, self.nsteps = counts, nsteps
        self.offsets = np.concatenate([[0], np.cumsum(counts)])
        self.nsym = int(self.offsets[-1])
        self._row_off = 0                            # buffer-row margin
        if window_mode in ("burst", "pallas", "fused"):
            self._burst_setup()                      # sets _row_off, Sbuf
        maxlen = int(counts.max())
        self.R = (maxlen + lanes - 1) // lanes       # AC rounds per step
        self.maxlenp = self.R * lanes

        i, j, g = order[:, 0], order[:, 1], order[:, 2]
        b, r = i // h, i % h
        grid = (g * self.h_out + i).astype(np.int32)          # CDF grid row
        plane = (((b * G + g) * h + r) * w + j).astype(np.int32)
        # input plane is channel-last (B, Sbuf, G): flat index s*G + g
        hindex = np.asarray(geom.hindex(self.h_out, w), np.int64)
        self.CCC = G + 11 * 3 * G * cpn            # merged channels (hoist)
        if hoist:
            in0 = (((b * h + r) * w + j) * self.CCC + g).astype(np.int32)
            in0w = None
        elif window_mode == "slab":
            col = self.LPAD + j
            in0 = (((b * h + r) * self.wbuf + col) * G + g).astype(np.int32)
            # circular-wrap duplicate for the two leftmost valid columns
            wsent = self.Sbuf * G
            in0w = np.where(
                j < 2,
                (((b * h + r) * self.wbuf + col + hindex[b]) * G + g),
                wsent).astype(np.int32)
        else:                       # gather/burst: flat (+margin for burst)
            in0 = (((self._row_off + (b * h + r) * w + j)) * G
                   + g).astype(np.int32)
            in0w = None

        # per-step padded index arrays (scan xs); sentinels target the
        # one-past-the-end slot of each scatter/gather destination
        mlp = self.maxlenp
        self.xs_grid = np.zeros((nsteps, mlp), np.int32)
        self.xs_plane = np.full((nsteps, mlp), self.P, np.int32)
        in0_sent = self.Sbuf * (self.CCC if hoist else G)
        self.xs_in0 = np.full((nsteps, mlp), in0_sent, np.int32)
        self.xs_in0w = (np.full((nsteps, mlp), self.Sbuf * G, np.int32)
                        if in0w is not None else None)
        self.xs_m = np.full((nsteps, mlp), self.nsym, np.int32)
        self.xs_valid = np.zeros((nsteps, mlp), bool)
        lane_counts = np.zeros(lanes, np.int64)
        lane_of_m = np.zeros(self.nsym, np.int32)
        for z in range(nsteps):
            n, o = int(counts[z]), int(self.offsets[z])
            self.xs_grid[z, :n] = grid[o:o + n]
            self.xs_plane[z, :n] = plane[o:o + n]
            self.xs_in0[z, :n] = in0[o:o + n]
            if in0w is not None:
                self.xs_in0w[z, :n] = in0w[o:o + n]
            self.xs_m[z, :n] = np.arange(o, o + n)
            self.xs_valid[z, :n] = True
            lane_of_m[o:o + n] = np.arange(n) % lanes
        lane_counts = np.bincount(lane_of_m, minlength=lanes).astype(np.int64)
        self.lane_counts = lane_counts
        self.lane_perm = np.argsort(lane_of_m, kind="stable")
        self.lane_sym_off = np.concatenate([[0], np.cumsum(lane_counts)])

        # static worst-case lane sizes: AC output <= 16 bits/sym + 2 bits
        # redundancy, +1 finish bit, byte padding
        lane_bits_max = lane_counts * 16 + 16
        self.lane_words_max = ((lane_bits_max + 31) // 32).astype(np.int64)
        self.word_off_1 = np.concatenate(
            [[0], np.cumsum(self.lane_words_max)])[:-1].astype(np.int32)
        self.NW = int(self.lane_words_max.sum())     # words per image

        self._program = jax.jit(self._program_impl, static_argnums=(),
                                donate_argnums=())
        self._weights = None

    @property
    def profile_flags(self) -> int:
        """Container flags encoding the executable profile (dtype, window
        mode, conv chunking): streams decode only on a matching profile."""
        from pseudocylindrical_convolution_tpu.codec import container
        f = container.FLAG_BF16 if self.dtype == jnp.bfloat16 else 0
        if self.window_mode == "slab":
            f |= container.FLAG_SLAB
        if self.window_mode == "burst":
            f |= container.FLAG_BURST
        if self.hoist:
            f |= container.FLAG_HOIST
        f |= (self.conv_chunks - 1) << container.CHUNKS_SHIFT
        return f

    @property
    def profile_flags2(self) -> int:
        from pseudocylindrical_convolution_tpu.codec import container
        f = container.FLAG2_MMPAD if self.pad_mode == "mm" else 0
        if self.window_mode == "pallas":
            f |= container.FLAG2_PALLASWIN
        if self.window_mode == "fused":
            f |= container.FLAG2_FUSEDSTEP
            if self._fused_unroll:
                f |= container.FLAG2_FUSEDUNROLL
        return f

    # ------------------------------------------------------------------
    def prepare(self, ent_params):
        """Stack, mask, shear, and subnet-fuse the entropy-net weights.

        The three parameter subnets (weight/delta/mean) are fused into ONE
        conv per layer: hidden layers as a feature_group_count=3 grouped
        conv over subnet-stacked channels (kernel (9, 5, C, 3*cout) HWIO),
        the input layer (shared input plane) as a single dense conv
        (kernel (9, 5, G, 3*cout)). Round-3 change: one conv dispatch per
        layer-step instead of three, and window-gather rows grow 3x (the
        gather was the measured per-step bottleneck, ARCHITECTURE.md §8)."""
        layers = stack_step_weights(ent_params, self.G, self.cpn, self.ng)
        self._weights = []
        for li, l in enumerate(layers):
            cout_full = self.G * l["w"].shape[2]
            # (3, cout_full, cin, 9, 5) -> (3, 9, 5, cin, cout_full)
            k = _shear_kernel(l["w"].reshape(
                3, cout_full, l["w"].shape[3], 5, 5)).transpose(0, 3, 4, 2, 1)
            # subnet-fused HWIO kernel (9, 5, cin, 3*cout_full)
            k = jnp.concatenate([k[0], k[1], k[2]], axis=-1).astype(
                self.dtype)
            b = l["b"].reshape(-1)                       # (3*cout_full,)
            a = None if l["a"] is None else l["a"].reshape(-1)
            self._weights.append({"k": k, "b": b, "a": a})

    # ------------------------------------------------------------------
    def _window(self, buf, z):
        """Skew window gathered through the causal pad tables, channel-last.

        buf: (B, S, CC) layer buffer (CC = 3*C subnet-stacked, or G for the
        input plane). Window element (b, rp, t) = padded[b, rp, cp],
        cp = z - G + 1 - h*b + t - rp (padded column coordinate). Returns
        (B, npart, h+4, T, CC): the gather fetches contiguous CC-rows (the
        vector lane axis), which is the fast gather shape on TPU."""
        idxp_np, wgtp_np = _static_tables(self.geom, self.h, self.w)
        idxp, wgtp = jnp.asarray(idxp_np), jnp.asarray(wgtp_np.astype(
            self.dtype))
        G, h, w, npart = self.G, self.h, self.w, self.npart
        T = G + 8
        b = jnp.arange(npart)[:, None, None]
        rp = jnp.arange(h + 4)[None, :, None]
        t = jnp.arange(T)[None, None, :]
        cp = z - G + 1 - h * b + t - rp               # (npart, h+4, T)
        oob = (cp < 0) | (cp >= w + 4)
        cc = jnp.where(oob, w + 4, cp)                # sentinel column
        i0 = jnp.take_along_axis(idxp[0], cc, axis=2)
        w0 = jnp.take_along_axis(wgtp[0], cc, axis=2)[..., None]
        win = jnp.take(buf, i0, axis=1) * w0
        # the second pad tap is only ever nonzero on the 4 vertical-pad
        # rows (neighbour-band lerp); gather those rows alone -- the
        # window gather is the measured per-step bottleneck
        prow = np.r_[0:2, h + 2:h + 4]
        ccp = cc[:, prow]
        i1 = jnp.take_along_axis(idxp[1][:, prow], ccp, axis=2)
        w1 = jnp.take_along_axis(wgtp[1][:, prow], ccp, axis=2)[..., None]
        gp = jnp.take(buf, i1, axis=1) * w1           # (B, npart, 4, T, CC)
        top = jax.lax.slice_in_dim(win, 0, 2, axis=2) \
            + jax.lax.slice_in_dim(gp, 0, 2, axis=2)
        mid = jax.lax.slice_in_dim(win, 2, h + 2, axis=2)
        bot = jax.lax.slice_in_dim(win, h + 2, h + 4, axis=2) \
            + jax.lax.slice_in_dim(gp, 2, 4, axis=2)
        return jnp.concatenate([top, mid, bot], axis=2)

    def _burst_setup(self):
        """Static margins, patch tables, and exactness audit for 'burst'.

        For an interior window row (band b, row r) at step z, window
        position t reads padded column cp = z - G + 1 - h*b + t - (r + 2),
        i.e. buffer column j = j0 + t with j0 = z - G - 3 - h*b - r:
        CONSECUTIVE columns. The flat buffer is row-major, so the whole
        (T, CC) row block is ONE contiguous slice at flat row
        (b*h + r)*w + j0 -- a row burst of T*CC elements (~50 KB at the
        flagship config) instead of T separate CC-sized gather rows. The
        margins M1/M2 are carried INSIDE the buffer so every burst start
        and end is statically in bounds (PROMISE_IN_BOUNDS, no per-step
        pad copy). Positions with j outside [0, w) are masked to zero;
        the <= 6 columns per row where the causal pad tables are not the
        identity-or-zero map (causal-left pad cp={0,1}, the circular wrap
        at the band's valid width cp={wl+2, wl+3}, the right wrap
        cp={w+2, w+3}) are patched via table gathers. The numpy audit
        below proves this decomposition reproduces the tables exactly for
        this geometry; a geometry that violates it raises at build time
        (use window_mode='gather' there)."""
        G, h, w, npart = self.G, self.h, self.w, self.npart
        T = G + 8
        S = self.S
        zmax = self.nsteps - 1
        b = np.arange(npart)[:, None]
        r = np.arange(h)[None, :]
        base = (b * h + r) * w
        j0_z0 = -G - 3 - h * b - r
        M1 = max(0, -int((base + j0_z0).min()))
        M2 = max(0, int((base + j0_z0 + zmax).max()) + T - S)
        self._row_off = M1
        # trailing pad to a multiple of 8 rows: Mosaic requires DMA slice
        # starts AND lengths on the sublane dim to be tile-aligned, and the
        # Pallas kernels' aligned-run loads (pallas_window._ext_rows) need
        # Sbuf % 8 == 0 so the clamped max start stays aligned.  The extra
        # zero rows are dead weight the gathers never index (PROMISE_IN_
        # BOUNDS reads are unchanged), value-neutral in every window mode.
        self.Sbuf = M1 + S + M2 + (-(M1 + S + M2)) % 8

        idxp_np, wgtp_np = _static_tables(self.geom, h, w)
        wl = np.asarray(self.geom.hindex(self.h_out, w), np.int64)
        cand = np.zeros((npart, 6), np.int64)
        dup = np.zeros((npart, 6), bool)
        for bb in range(npart):
            cand[bb] = [0, 1, wl[bb] + 2, wl[bb] + 3, w + 2, w + 3]
            seen = set()
            for k in range(6):
                c = int(cand[bb, k])
                dup[bb, k] = c in seen
                seen.add(c)
        # audit: every interior-row table entry is identity (inside the
        # image, weight 1), provably zero (weight 0 AND the buffer is zero
        # at the source), or one of the candidate patch columns
        jj = np.arange(w + 4) - 2                         # (w+4,)
        flat = (b * h + r)[..., None] * w + jj            # (np, h, w+4)
        idx = idxp_np[0][:, 2:h + 2, :w + 4]
        wgt = wgtp_np[0][:, 2:h + 2, :w + 4]
        inw = (jj >= 0) & (jj < w)
        ident = inw[None, None, :] & (idx == flat) & (wgt == 1.0)
        bufzero = ~((jj[None, :] >= 0) & (jj[None, :] < wl[:, None]))
        zerook = (wgt == 0.0) & bufzero[:, None, :]
        iscand = np.zeros((npart, w + 4), bool)
        for bb in range(npart):
            iscand[bb, cand[bb][~dup[bb]]] = True
        if not (ident | zerook | iscand[:, None, :]).all():
            raise ValueError(
                "burst window mode: the causal pad tables of this geometry "
                "do not decompose into identity + <=6 patch columns; use "
                "window_mode='gather'")
        cand_b = np.broadcast_to(cand[:, None, :], (npart, h, 6))
        idx6 = np.take_along_axis(idxp_np[0][:, 2:h + 2], cand_b, axis=2)
        wgt6 = np.take_along_axis(wgtp_np[0][:, 2:h + 2], cand_b, axis=2)
        self._burst_idx6 = (idx6 + M1).astype(np.int32)
        self._burst_wgt6 = (wgt6 * ~dup[:, None, :]).astype(np.float32)
        self._burst_cand = cand

    def _interior_burst(self, buf, z):
        """Interior window rows via one contiguous run-gather per (band,
        row). buf: (B, Sbuf, CC) margin-carrying flat buffer; returns
        (B, npart, h, T, CC), value-equal to _window's interior rows."""
        G, h, w, npart = self.G, self.h, self.w, self.npart
        T = G + 8
        B, CC = buf.shape[0], buf.shape[-1]
        M1 = self._row_off
        b = jnp.arange(npart)[:, None]
        r = jnp.arange(h)[None, :]
        j0 = z - G - 3 - h * b - r                       # (np, h)
        starts = ((M1 + (b * h + r) * w + j0) * CC).reshape(-1, 1)
        flat = buf.reshape(B, self.Sbuf * CC)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
        runs = jax.vmap(lambda f: jax.lax.gather(
            f, starts.astype(jnp.int32), dn, slice_sizes=(T * CC,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS))(flat)
        win = runs.reshape(B, npart, h, T, CC)
        t = jnp.arange(T)[None, None, :]
        jj = j0[..., None] + t                           # (np, h, T)
        win = jnp.where(((jj >= 0) & (jj < w))[None, ..., None], win,
                        jnp.zeros((), win.dtype))
        # patch the <=6 non-identity columns from the pad tables
        idx6 = jnp.asarray(self._burst_idx6)
        wgt6 = jnp.asarray(self._burst_wgt6.astype(self.dtype))
        v6 = jnp.take(buf, idx6, axis=1) * wgt6[..., None]   # (B,np,h,6,CC)
        tpos = jnp.asarray(self._burst_cand)[:, None, :] - 2 \
            - j0[..., None]                              # (np, h, 6)
        for k in range(6):
            m = t == tpos[..., k][..., None]             # (np, h, T)
            win = win + jnp.where(m[None, ..., None], v6[:, :, :, k][
                :, :, :, None, :], jnp.zeros((), win.dtype))
        return win

    @functools.cached_property
    def _pallas_call(self):
        from pseudocylindrical_convolution_tpu.codec.pallas_window import (
            build_window_call)
        interpret = jax.default_backend() != "tpu"
        return build_window_call(
            B=self.B, npart=self.npart, h=self.h, w=self.w, T=self.G + 8,
            CC=3 * self.G * self.cpn, Sbuf=self.Sbuf, dtype=self.dtype,
            interpret=interpret)

    @functools.cached_property
    def _pallas_call_in0(self):
        from pseudocylindrical_convolution_tpu.codec.pallas_window import (
            build_window_call)
        interpret = jax.default_backend() != "tpu"
        return build_window_call(
            B=self.B, npart=self.npart, h=self.h, w=self.w, T=self.G + 8,
            CC=self.G, Sbuf=self.Sbuf, dtype=self.dtype,
            interpret=interpret)

    def _pallas_prep(self, buf, z):
        """Per-step scalar/table inputs shared by the Pallas window and
        fused kernels: burst starts, patch values, pad-row selections.

        The XLA side computes only tiny per-step index/selection arrays
        (scalar-prefetched into SMEM) and the <=6 pre-weighted patch
        values per interior row; all HBM traffic for the window itself is
        contiguous DMA inside the kernel."""
        G, h, w, npart = self.G, self.h, self.w, self.npart
        T = G + 8
        M1 = self._row_off
        b = jnp.arange(npart)[:, None]
        r = jnp.arange(h)[None, :]
        j0 = z - G - 3 - h * b - r                       # (np, h)
        starts = (M1 + (b * h + r) * w + j0).astype(jnp.int32)
        # patch values, pre-weighted (same tables as _interior_burst)
        idx6 = jnp.asarray(self._burst_idx6)
        wgt6 = jnp.asarray(self._burst_wgt6.astype(self.dtype))
        v6 = jnp.take(buf, idx6, axis=1) * wgt6[..., None]  # (B,np,h,6,CC)
        tpos = (jnp.asarray(self._burst_cand)[:, None, :] - 2
                - j0[..., None]).astype(jnp.int32)       # (np, h, 6)
        # pad-row selection tables for step z
        Rrow, colT, wgtT, cp0b = self._mmpad_tables
        ccM = jnp.asarray(cp0b)[:, None] + z + jnp.arange(T)[None, :]
        inb = (ccM >= 0) & (ccM <= w + 4)
        ccc = jnp.clip(ccM, 0, w + 4)
        colz = jnp.take_along_axis(jnp.asarray(colT), ccc, axis=1)
        wz = jnp.take_along_axis(
            jnp.asarray(wgtT.astype(self.dtype)), ccc, axis=1)
        wz = jnp.where(inb, wz, jnp.zeros((), self.dtype))
        colz = colz.reshape(npart, 4, 2, T).astype(jnp.int32)
        wz = wz.reshape(npart, 4, 2, T)
        pstarts = jnp.asarray(
            (M1 + Rrow.astype(np.int64) * w).astype(np.int32).reshape(
                npart, 4, 2))
        return starts, pstarts, j0.astype(jnp.int32), tpos, v6, colz, wz

    def _window_pallas(self, buf, z):
        """Full (B, npart, h+4, T, CC) window via the Pallas VMEM kernel."""
        CC = buf.shape[-1]
        starts, pstarts, j0, tpos, v6, colz, wz = self._pallas_prep(buf, z)
        call = self._pallas_call if CC != self.G else self._pallas_call_in0
        return call(starts, pstarts, j0, tpos, buf, v6, colz, wz)

    @functools.cached_property
    def _fused_calls(self):
        return {}

    def _fused_conv(self, buf, z, layer):
        """Fused window+conv layer-step (codec/pallas_fused.py): returns
        frontier cells (B, npart, h, cout3) with bias/activation applied,
        the window staying VMEM-resident."""
        from pseudocylindrical_convolution_tpu.codec.pallas_fused import (
            build_fused_conv_call)
        CC = buf.shape[-1]
        K = layer["k"]                                 # (9, 5, CI, cout3)
        CI, cout3 = K.shape[2], K.shape[3]
        key = (CC, CI, cout3)
        if key not in self._fused_calls:
            self._fused_calls[key] = build_fused_conv_call(
                B=self.B, npart=self.npart, h=self.h, w=self.w,
                T=self.G + 8, CC=CC, CI=CI, cout3=cout3,
                nchunks=self.conv_chunks, Sbuf=self.Sbuf, dtype=self.dtype,
                interpret=jax.default_backend() != "tpu",
                unroll_taps=self._fused_unroll)
        starts, pstarts, j0, tpos, v6, colz, wz = self._pallas_prep(buf, z)
        cells = self._fused_calls[key](
            starts, pstarts, j0, tpos, buf, K.reshape(45, CI, cout3),
            v6, colz, wz)
        cells = cells + layer["b"].reshape(1, 1, 1, cout3)
        if layer["a"] is not None:
            a = layer["a"].reshape(1, 1, 1, cout3)
            cells = jnp.where(cells >= 0, cells, a * cells)
        return cells

    def _pad_rows_g(self, buf, z):
        """The 4 vertical-pad window rows via the 2-tap tables (gather
        layout). buf: (B, S, CC); returns (B, npart, 4, T, CC)."""
        idxp_np, wgtp_np = _static_tables(self.geom, self.h, self.w)
        G, h, w, npart = self.G, self.h, self.w, self.npart
        prow = np.r_[0:2, h + 2:h + 4]
        idxp = jnp.asarray(idxp_np[:, :, prow] + self._row_off)
        wgtp = jnp.asarray(wgtp_np[:, :, prow].astype(self.dtype))
        T = G + 8
        b = jnp.arange(npart)[:, None, None]
        rp = jnp.asarray(prow)[None, :, None]
        t = jnp.arange(T)[None, None, :]
        cp = z - G + 1 - h * b + t - rp
        oob = (cp < 0) | (cp >= w + 4)
        cc = jnp.where(oob, w + 4, cp)
        i0 = jnp.take_along_axis(idxp[0], cc, axis=2)
        w0 = jnp.take_along_axis(wgtp[0], cc, axis=2)[..., None]
        i1 = jnp.take_along_axis(idxp[1], cc, axis=2)
        w1 = jnp.take_along_axis(wgtp[1], cc, axis=2)[..., None]
        return (jnp.take(buf, i0, axis=1) * w0
                + jnp.take(buf, i1, axis=1) * w1)

    @functools.cached_property
    def _mmpad_tables(self):
        """Static tables for pad_mode='mm', with the single-source-row audit.

        For each p = (band, pad-row k, tap) flattened: Rrow[p] -- the one
        plane row every live table entry of that tap reads (a build-time
        assert enforces it; geometries violating it must use
        pad_mode='gather'); col[p, cc] -- the column within that row;
        wgt[p, cc] -- the lerp weight (0 rows select nothing); cp0b[p] --
        the z-independent part of the window's padded-column origin."""
        idxp_np, wgtp_np = _static_tables(self.geom, self.h, self.w)
        G, h, w, npart = self.G, self.h, self.w, self.npart
        prow = np.r_[0:2, h + 2:h + 4]
        P = npart * 4 * 2
        Rrow = np.zeros(P, np.int32)
        col = np.zeros((P, w + 5), np.int32)
        wgt = np.zeros((P, w + 5), np.float32)
        cp0b = np.zeros(P, np.int32)
        p = 0
        for b in range(npart):
            for k in range(4):
                for tap in range(2):
                    idx = idxp_np[tap][b, prow[k]]
                    wg = wgtp_np[tap][b, prow[k]]
                    live = wg != 0
                    if live.any():
                        rows = np.unique(idx[live] // w)
                        assert len(rows) == 1, (
                            "pad_mode='mm' needs single-row taps; this "
                            "geometry's pad tables span multiple rows -- "
                            "use pad_mode='gather'")
                        Rrow[p] = rows[0]
                        col[p, live] = idx[live] - rows[0] * w
                    wgt[p] = wg
                    cp0b[p] = -G + 1 - h * b - prow[k]
                    p += 1
        return Rrow, col, wgt, cp0b

    def _pad_rows_mm(self, buf, z):
        """The 4 vertical-pad window rows as one-hot selection matmuls.

        buf: (B, Sbuf, CC); returns (B, npart, 4, T, CC), value-equal to
        _pad_rows_g (each output element is ONE exact product plus exact
        zeros, so the MXU f32 accumulation rounds identically to the
        elementwise gather-multiply). The per-p source rows are contiguous
        (w*CC)-element runs of the flat buffer and the selection matrices
        are built once per step from tiny static tables -- no per-position
        HBM gathers."""
        G, h, w, npart = self.G, self.h, self.w, self.npart
        T = G + 8
        B, CC = buf.shape[0], buf.shape[-1]
        Rrow, colT, wgtT, cp0b = self._mmpad_tables
        P = Rrow.shape[0]
        ccM = jnp.asarray(cp0b)[:, None] + z + jnp.arange(T)[None, :]
        inb = (ccM >= 0) & (ccM <= w + 4)
        ccc = jnp.clip(ccM, 0, w + 4)                    # (P, T)
        colz = jnp.take_along_axis(jnp.asarray(colT), ccc, axis=1)
        wz = jnp.take_along_axis(
            jnp.asarray(wgtT.astype(self.dtype)), ccc, axis=1)
        wz = jnp.where(inb, wz, jnp.zeros((), self.dtype))
        M = jnp.where(colz[:, :, None] == jnp.arange(w)[None, None, :],
                      wz[:, :, None], jnp.zeros((), self.dtype))  # (P, T, w)
        starts = ((self._row_off + Rrow.astype(np.int64) * w) * CC
                  ).astype(np.int32).reshape(-1, 1)
        flat = buf.reshape(B, self.Sbuf * CC)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
        runs = jax.vmap(lambda f: jax.lax.gather(
            f, jnp.asarray(starts), dn, slice_sizes=(w * CC,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS))(flat)
        src = runs.reshape(B, P, w, CC)
        out = jnp.einsum("ptw,bpwc->bptc", M, src,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(B, npart, 4, 2, T, CC)
        return out[:, :, :, 0] + out[:, :, :, 1]

    def _hoist_window(self, bufH, z):
        """ONE stacked interior-row gather for every layer's window.

        bufH: (B, S, CCC) merged buffer (input plane channels [0:G], then
        the 11 hidden buffers' 3C-channel slices). Interior window rows
        use only pad tap 0 (the neighbour-band lerp tap is provably zero
        off the 4 vertical-pad rows), so one gather of (npart, h, T)
        positions with CCC-wide rows serves all 12 layer convs; per-layer
        same-step frontier cells are patched in by _lhs_hoist. Returns
        (B, npart, h, T, CCC)."""
        idxp_np, wgtp_np = _static_tables(self.geom, self.h, self.w)
        G, h, w, npart = self.G, self.h, self.w, self.npart
        idxp = jnp.asarray(idxp_np[0][:, 2:h + 2])
        wgtp = jnp.asarray(wgtp_np[0][:, 2:h + 2].astype(self.dtype))
        T = G + 8
        b = jnp.arange(npart)[:, None, None]
        r = jnp.arange(h)[None, :, None]
        t = jnp.arange(T)[None, None, :]
        cp = z - G + 1 - h * b + t - (r + 2)
        oob = (cp < 0) | (cp >= w + 4)
        cc = jnp.where(oob, w + 4, cp)
        i0 = jnp.take_along_axis(idxp, cc, axis=2)
        w0 = jnp.take_along_axis(wgtp, cc, axis=2)[..., None]
        return jnp.take(bufH, i0, axis=1) * w0

    def _lhs_hoist(self, win_all, bufH, z, li, fresh):
        """Per-layer conv lhs from the hoisted window.

        li: layer index 0..11 (0 reads the input-plane channels, else
        hidden buffer li-1); fresh: the cells deposited into that buffer
        THIS step (None for the input plane -- its symbols were scattered
        at the end of step z-1), patched into the gathered window at the
        per-group frontier slices t = G+3-g and the circular-wrap alias
        slices t = G+3-g+hindex[b]."""
        G, h, B, npart = self.G, self.h, self.B, self.npart
        T = G + 8
        CC3 = 3 * G * self.cpn
        c0 = 0 if li == 0 else self.G + (li - 1) * CC3
        c1 = self.G if li == 0 else c0 + CC3
        win = win_all[..., c0:c1]                     # (B, np, h, T, CC)
        if fresh is not None:
            CC = c1 - c0
            grp = jnp.asarray((np.arange(CC) % (CC // 3)) // self.cpn)
            b = jnp.arange(npart)[:, None, None, None]
            r = jnp.arange(h)[None, :, None, None]
            t = jnp.arange(T)[None, None, :, None]
            g = grp[None, None, None, :]
            jstar = z - g - (h * b + r)               # frontier column
            wl = jnp.asarray(np.asarray(self.geom.hindex(self.h_out,
                                                         self.w)))[
                :, None, None, None]
            m1 = (t == G + 3 - g) & (jstar >= 0) & (jstar < wl)
            m2 = (t == G + 3 - g + wl) & (jstar >= 0) \
                & (jstar < jnp.minimum(wl, 2))
            win = win + jnp.where(
                (m1 | m2)[None], fresh.astype(win.dtype)[:, :, :, None, :],
                jnp.zeros((), win.dtype))
        pads = self._pad_rows_g(
            jax.lax.slice_in_dim(bufH, c0, c1, axis=2), z)
        padsT = pads.transpose(0, 1, 3, 2, 4)         # (B, np, T, 4, CC)
        interior = win.transpose(0, 1, 3, 2, 4)       # (B, np, T, h, CC)
        lhs = jnp.concatenate(
            [padsT[:, :, :, 0:2], interior, padsT[:, :, :, 2:4]], axis=3)
        return lhs.reshape(B * npart, T, h + 4, lhs.shape[-1])

    def _deposit_hoist(self, bufH, cells, z, k):
        """Deposit cells into hidden buffer k's channel slice of the
        merged buffer."""
        CC3 = 3 * self.G * self.cpn
        c0 = self.G + k * CC3
        sl = jax.lax.slice_in_dim(bufH, c0, c0 + CC3, axis=2)
        return jax.lax.dynamic_update_slice(
            bufH, self._deposit(sl, cells, z), (0, 0, c0))

    @functools.cached_property
    def _slab_tables(self):
        """Pad-row 2-tap tables remapped to the slab (padded-row) layout.

        Returns (idxp (2, npart, 4, w+5), wgtp same) for the 4 vertical-pad
        rows only; indices address the flat (npart*h*wbuf) padded buffer."""
        idxp_np, wgtp_np = _static_tables(self.geom, self.h, self.w)
        prow = np.r_[0:2, self.h + 2:self.h + 4]
        idx = idxp_np[:, :, prow].astype(np.int64)
        wgt = wgtp_np[:, :, prow]
        idx = (idx // self.w) * self.wbuf + self.LPAD + idx % self.w
        return idx.astype(np.int32), wgt

    def _interior_slab(self, buf, z):
        """Interior window rows via one contiguous dynamic slice per band.

        buf: (B, Sbuf, CC) padded flat buffer. The window's interior value
        at (b, r, t) is padded-row col j = z - G - 3 - h*b - r + t, a
        parallelogram over (r, t); one (h, SW)-slab dynamic slice at
        col z - G - 3 - h*b - (h-1) plus h static row shifts covers it.
        Causal-left zeros / validity / circular wrap are physical in the
        slab layout (wrap columns written by _deposit), so no masking.
        Returns (B, npart, T, h, CC)."""
        G, h, npart, B = self.G, self.h, self.npart, self.B
        T = G + 8
        wbuf, LPAD, SW = self.wbuf, self.LPAD, self.SW
        bufv = buf.reshape(B, npart, h, wbuf, buf.shape[-1])
        outs = []
        for b in range(npart):
            sc = z - G - 3 - h * b - (h - 1)
            scc = jnp.clip(sc, -self.SW_raw, self.w + 2)
            blk = jax.lax.dynamic_slice_in_dim(
                bufv[:, b], scc + LPAD, SW, axis=2)     # (B, h, SW, CC)
            rows = [jax.lax.slice_in_dim(blk[:, r], h - 1 - r,
                                         h - 1 - r + T, axis=1)
                    for r in range(h)]
            outs.append(jnp.stack(rows, axis=1))        # (B, h, T, CC)
        win = jnp.stack(outs, axis=1)                   # (B, np, h, T, CC)
        return win.transpose(0, 1, 3, 2, 4)

    def _pad_rows_slab(self, buf, z):
        """The 4 vertical-pad window rows as 2-tap table gathers (slab
        layout). Returns (B, npart, 4, T, CC)."""
        idx_np, wgt_np = self._slab_tables
        idxp, wgtp = jnp.asarray(idx_np), jnp.asarray(
            wgt_np.astype(self.dtype))
        G, h, w, npart = self.G, self.h, self.w, self.npart
        T = G + 8
        prow = np.r_[0:2, h + 2:h + 4]
        b = jnp.arange(npart)[:, None, None]
        rp = jnp.asarray(prow)[None, :, None]
        t = jnp.arange(T)[None, None, :]
        cp = z - G + 1 - h * b + t - rp               # (npart, 4, T)
        oob = (cp < 0) | (cp >= w + 4)
        cc = jnp.where(oob, w + 4, cp)                # sentinel column
        i0 = jnp.take_along_axis(idxp[0], cc, axis=2)
        w0 = jnp.take_along_axis(wgtp[0], cc, axis=2)[..., None]
        i1 = jnp.take_along_axis(idxp[1], cc, axis=2)
        w1 = jnp.take_along_axis(wgtp[1], cc, axis=2)[..., None]
        return (jnp.take(buf, i0, axis=1) * w0
                + jnp.take(buf, i1, axis=1) * w1)

    def _lhs(self, buf, z):
        """Window as conv lhs (B*npart, T, h+4, CC) for any window mode."""
        G, h, B, npart = self.G, self.h, self.B, self.npart
        if self.window_mode in ("gather", "burst", "pallas"):
            if self.window_mode == "gather":
                win = self._window(buf, z)             # (B, np, h+4, T, CC)
            elif self.window_mode == "pallas":
                win = self._window_pallas(buf, z)
            else:
                mid = self._interior_burst(buf, z)     # (B, np, h, T, CC)
                pads = (self._pad_rows_mm(buf, z)      # (B, np, 4, T, CC)
                        if self.pad_mode == "mm"
                        else self._pad_rows_g(buf, z))
                win = jnp.concatenate(
                    [pads[:, :, 0:2], mid, pads[:, :, 2:4]], axis=2)
            return win.transpose(0, 1, 3, 2, 4).reshape(
                B * npart, G + 8, h + 4, win.shape[-1])
        interior = self._interior_slab(buf, z)         # (B, np, T, h, CC)
        pads = self._pad_rows_slab(buf, z)             # (B, np, 4, T, CC)
        padsT = pads.transpose(0, 1, 3, 2, 4)          # (B, np, T, 4, CC)
        lhs = jnp.concatenate(
            [padsT[:, :, :, 0:2], interior, padsT[:, :, :, 2:4]], axis=3)
        return lhs.reshape(B * npart, G + 8, h + 4, lhs.shape[-1])

    def _frontier_conv(self, buf, z, layer):
        """One layer's new frontier cells via the sheared-kernel conv.

        buf: (B, Sbuf, CC) subnet-stacked layer buffer [or (B, Sbuf, G)
        input plane]; returns channel-last cells (B, npart, h, 3*C_out)."""
        if self.window_mode == "fused":
            return self._fused_conv(buf, z, layer)
        return self._conv_cells(self._lhs(buf, z), layer)

    def _conv_cells(self, lhs, layer):
        """Apply one layer's sheared conv to a prebuilt window lhs."""
        G, h, B, npart = self.G, self.h, self.B, self.npart
        K, bias, act = layer["k"], layer["b"], layer["a"]
        cout3 = K.shape[-1]                            # 3 * cout_full
        cout_full = cout3 // 3
        CC = lhs.shape[-1]
        # input plane (CC == G): one dense conv; hidden layers: grouped
        # conv, one feature group per parameter subnet (static by shape)
        fg = 1 if CC == G else 3
        nch = self.conv_chunks
        cpg = cout_full // G                           # channels per group
        if nch == 1:
            if fg == 1:
                outs = [jax.lax.conv_general_dilated(
                    lhs, K, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)]  # (B*np,G_y,h,co3)
            else:
                # per-subnet convs with sliced lhs/kernel: XLA expands a
                # feature_group_count=3 conv into a dense block-diagonal
                # conv on TPU (3x FLOPs; measured +2 ms/step), so the
                # subnet fusion stays a BUFFER-layout property (3x-wider
                # gather rows) while the MXU work is per subnet
                C = CC // 3
                outs = [jax.lax.conv_general_dilated(
                    jax.lax.slice_in_dim(lhs, s * C, (s + 1) * C, axis=3),
                    jax.lax.slice_in_dim(K, s * cout_full,
                                         (s + 1) * cout_full, axis=3),
                    (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                    for s in range(3)]
            out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else \
                outs[0]
            # output channel c (subnet s = c // cout_full, group
            # g = (c % cout_full) // cpg) keeps y-slice G-1-g: masked
            # reduction over G_y (streaming; replaces flip+diagonal)
            grp = (np.arange(cout3) % cout_full) // cpg
            sel = (np.arange(G)[:, None] == (G - 1 - grp)[None, :])
            out = jnp.sum(out * jnp.asarray(sel, out.dtype)[None, :, None],
                          axis=1)
            out = out.reshape(B, npart, h, cout3)
        else:
            # chunk of output groups [g0, g0+c): only window slices
            # [G-g0-c, G-g0+8) contribute; conv output slice i keeps the
            # channels of group g0 + (c-1-i)
            c = G // nch
            C = CC // 3
            souts = []
            for k in range(nch):
                g0 = k * c
                lhs_k = jax.lax.slice_in_dim(lhs, G - g0 - c, G - g0 + 8,
                                             axis=1)
                ch = np.arange(g0 * cpg, (g0 + c) * cpg)
                if fg == 1:
                    kcols = np.concatenate([ch + s * cout_full
                                            for s in range(3)])
                    o = jax.lax.conv_general_dilated(
                        lhs_k, K[..., kcols], (1, 1), "VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)  # (B*np,c,h,ock)
                else:
                    # per-subnet convs (see the nch == 1 comment on the
                    # feature_group_count slow path)
                    o = jnp.concatenate([
                        jax.lax.conv_general_dilated(
                            jax.lax.slice_in_dim(lhs_k, s * C, (s + 1) * C,
                                                 axis=3),
                            K[..., ch + s * cout_full], (1, 1), "VALID",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.float32)
                        for s in range(3)], axis=-1)
                ock = o.shape[-1]                         # 3 * c * cpg
                gg = (np.arange(ock) % (c * cpg)) // cpg  # group within chunk
                sel = (np.arange(c)[:, None] == (c - 1 - gg)[None, :])
                o = jnp.sum(o * jnp.asarray(sel, o.dtype)[None, :, None],
                            axis=1)                       # (B*np, h, ock)
                souts.append(o.reshape(B, npart, h, 3, c * cpg))
            # reassemble subnet-major full channel order (s, g, cpg)
            out = jnp.concatenate(souts, axis=4).reshape(B, npart, h, cout3)
        out = out + bias.reshape(1, 1, 1, cout3)
        if act is not None:
            a = act.reshape(1, 1, 1, cout3)
            out = jnp.where(out >= 0, out, a * out)
        return out

    def _deposit(self, buf, cells, z):
        """Add the step-z frontier cells into a channel-last layer buffer.

        Flat layout -- buf: (B, S, 3C); cells: (B, npart, h, 3C). The
        write target of channel c (group g = (c % C) // cpn) at tile row
        (b, r) is column j = z - g - (h*b+r); expressed as an iota
        comparison the update is one streaming masked add over the buffer
        -- far cheaper than an XLA scatter on TPU (and than dynamic-slice
        read-modify-writes; both alternatives measured slower,
        ARCHITECTURE.md §8)."""
        G, h, w, npart = self.G, self.h, self.w, self.npart
        CC = buf.shape[-1]
        C = CC // 3
        grp = jnp.asarray((np.arange(CC) % C) // (C // G))     # (CC,)
        b = jnp.arange(npart)[:, None, None, None]
        r = jnp.arange(h)[None, :, None, None]
        tgt = z - grp[None, None, None, :] - (h * b + r)       # (np,h,1,CC)+j
        wl = jnp.asarray(np.asarray(self.geom.hindex(self.h_out, w)))[
            :, None, None, None]
        if self.window_mode == "slab":
            # padded-row layout: store at LPAD + tgt, plus the circular-
            # wrap duplicate at LPAD + wl + tgt for the two leftmost
            # valid columns (physical wrap; _interior_slab relies on it)
            jj = jnp.arange(self.wbuf)[None, None, :, None]
            j = jj - self.LPAD
            mask = ((j == tgt) & (j >= 0) & (j < wl)) \
                | ((j == tgt + wl) & (tgt >= 0) & (tgt < jnp.minimum(wl, 2)))
        else:
            j = jnp.arange(w)[None, None, :, None]
            mask = (j == tgt) & (j < wl)                       # (np,h,w,CC)
        upd = jnp.where(mask[None], cells.astype(buf.dtype)[:, :, :, None, :],
                        jnp.zeros((), buf.dtype))          # (B,np,h,wb,CC)
        if self.window_mode in ("burst", "pallas", "fused"):
            # margin-carrying buffer: streaming add into the core rows
            # (static slice -> fused dynamic-update-slice, no extra copy)
            B = cells.shape[0]
            core = upd.reshape(B, self.S, CC)
            return buf.at[:, self._row_off:self._row_off + self.S, :].add(
                core)
        return buf + upd.reshape(buf.shape)

    # ------------------------------------------------------------------
    def _program_impl(self, weights, words, word_off, nbits, teacher,
                      decode_flag):
        """words: (B*NW,) uint32; word_off/nbits: (B, L); teacher: (B, P)
        int32 symbol plane (flat (npart, G, h, w)); decode_flag: bool scalar.

        Returns (symbol plane (B, P) int32, packed ranges (B, nsym) uint32).
        """
        B, L, G, h, w = self.B, self.L, self.G, self.h, self.w
        npart, S, P = self.npart, self.Sbuf, self.P
        cpn, ng, R = self.cpn, self.ng, self.R
        C = G * cpn

        if self.hoist:                                   # merged buffer
            bufs = [jnp.zeros((B, S, self.CCC), self.dtype)]
        else:
            bufs = [jnp.zeros((B, S, G), self.dtype)]    # channel-last
            for _ in range(11):                          # subnet-stacked
                bufs.append(jnp.zeros((B, S, 3 * C), self.dtype))
        ac = device_ac.init_state(words, word_off, nbits)
        out_plane = jnp.zeros((B, P + 1), jnp.int32)
        packed = jnp.zeros((B, self.nsym + 1), jnp.uint32)

        if self.xs_in0w is not None:     # slab: one scatter incl. wrap dups
            xs_in0 = np.concatenate([self.xs_in0, self.xs_in0w], axis=1)
        else:
            xs_in0 = self.xs_in0
        xs = (jnp.arange(self.nsteps),
              jnp.asarray(self.xs_grid), jnp.asarray(self.xs_plane),
              jnp.asarray(xs_in0), jnp.asarray(self.xs_m),
              jnp.asarray(self.xs_valid))

        def body(carry, x):
            bufs, ac, out_plane, packed = carry
            z, grid_sel, plane_sel, in0_sel, m_sel, valid = x

            if self.hoist:
                bufH = bufs[0]
                win_all = self._hoist_window(bufH, z)
                dep = [None] * 11   # cells deposited into hidden buf k
                y0 = self._conv_cells(
                    self._lhs_hoist(win_all, bufH, z, 0, None), weights[0])
                bufH = self._deposit_hoist(bufH, y0, z, 0)
                dep[0] = y0
                ycells = y0
                for blk in range(5):
                    li = 1 + 2 * blk
                    c1 = self._conv_cells(
                        self._lhs_hoist(win_all, bufH, z, li, dep[2 * blk]),
                        weights[li])
                    bufH = self._deposit_hoist(bufH, c1, z, 2 * blk + 1)
                    dep[2 * blk + 1] = c1
                    c2 = self._conv_cells(
                        self._lhs_hoist(win_all, bufH, z, li + 1,
                                        dep[2 * blk + 1]), weights[li + 1])
                    ycells = ycells + c2
                    bufH = self._deposit_hoist(bufH, ycells, z, 2 * blk + 2)
                    dep[2 * blk + 2] = ycells
                out = self._conv_cells(
                    self._lhs_hoist(win_all, bufH, z, 11, dep[10]),
                    weights[11])
                bufs = [bufH]
            else:
                y0 = self._frontier_conv(bufs[0], z, weights[0])
                bufs[1] = self._deposit(bufs[1], y0, z)
                ycells = y0
                for blk in range(5):
                    li = 1 + 2 * blk
                    c1 = self._frontier_conv(bufs[1 + 2 * blk], z,
                                             weights[li])
                    bufs[2 + 2 * blk] = self._deposit(bufs[2 + 2 * blk], c1,
                                                      z)
                    c2 = self._frontier_conv(bufs[2 + 2 * blk], z,
                                             weights[li + 1])
                    ycells = ycells + c2
                    bufs[3 + 2 * blk] = self._deposit(bufs[3 + 2 * blk],
                                                      ycells, z)
                out = self._frontier_conv(bufs[11], z, weights[11])
            # CDF grid (B, G*h_out, 9): grid row = g*h_out + (b*h + r);
            # out channels are subnet-major (s, g, k)
            prm = out.reshape(B, npart, h, 3, G, ng).transpose(
                3, 0, 4, 1, 2, 5).reshape(3, B, G * self.h_out, ng)
            tb = jax.vmap(
                lambda ww, dd, mm: gmm_cdf_table(ww, dd, mm, NSTEP, BIAS,
                                                 TOTAL))(
                prm[0], prm[1], prm[2])              # (B, NG, 9) int32
            tbu = tb.astype(jnp.uint32)

            nrounds = (jnp.sum(valid.astype(jnp.int32)) + (L - 1)) // L

            # hoist everything that is not AC-state-sequential out of the
            # round loop: ONE per-step CDF gather and (in teacher mode) ONE
            # symbol gather up front; the loop only advances the AC state and
            # stores each round's L symbols contiguously. Ablation showed the
            # old 3-scatters-per-round dominated the AC section.
            cdf_all = tbu[:, grid_sel]                       # (B, mlp, 9)
            tsy_all = jnp.where(
                jnp.broadcast_to(valid[None], (B, self.maxlenp)),
                teacher[:, jnp.minimum(plane_sel, P - 1)], 0)
            sy_all = jnp.zeros((B, self.maxlenp), jnp.uint32)

            def round_body(st):
                rr, ac, sy_all = st
                off = rr * L
                act_l = jax.lax.dynamic_slice(valid, (off,), (L,))
                actB = jnp.broadcast_to(act_l[None], (B, L))
                cdf = jax.lax.dynamic_slice(
                    cdf_all, (0, off, 0), (B, L, 9))
                ac, sy = device_ac.decode_symbols(ac, words, cdf, actB)
                sy_all = jax.lax.dynamic_update_slice(
                    sy_all, sy.astype(jnp.uint32), (0, off))
                return rr + 1, ac, sy_all

            def dec_rounds(op):
                # dynamic round count: steps average ~half the worst-case
                # symbol count, so a while_loop halves the AC-section cost
                # vs a static R-round unroll
                _, ac, sy = jax.lax.while_loop(
                    lambda st: st[0] < nrounds, round_body,
                    (jnp.int32(0),) + op)
                return ac, sy

            def tea_rounds(op):
                # teacher (encode) mode never touches the AC state: the
                # round loop would only copy teacher symbols, so skip it
                # wholesale (identical sy_all: invalid slots are already 0)
                ac, _ = op
                return ac, tsy_all.astype(jnp.uint32)

            ac, sy_all = jax.lax.cond(decode_flag, dec_rounds, tea_rounds,
                                      (ac, sy_all))

            syi = sy_all.astype(jnp.int32)
            lowv = jnp.take_along_axis(cdf_all, syi[..., None],
                                       axis=-1)[..., 0]
            highv = jnp.take_along_axis(cdf_all, syi[..., None] + 1,
                                        axis=-1)[..., 0]
            pk = lowv | ((highv - jnp.uint32(1)) << jnp.uint32(16))
            out_plane = out_plane.at[:, plane_sel].set(syi, mode="drop")
            packed = packed.at[:, m_sel].set(pk, mode="drop")
            vals = (sy_all.astype(jnp.float32) - BIAS).astype(self.dtype)
            if in0_sel.shape[-1] != vals.shape[-1]:   # slab wrap duplicates
                vals = jnp.concatenate([vals, vals], axis=-1)
            cin0 = bufs[0].shape[-1]                  # G, or CCC (hoist)
            new_in0 = bufs[0].reshape(B, S * cin0).at[:, in0_sel].set(
                vals, mode="drop")
            bufs[0] = new_in0.reshape(B, S, cin0)
            return (bufs, ac, out_plane, packed), None

        (bufs, ac, out_plane, packed), _ = jax.lax.scan(
            body, (bufs, ac, out_plane, packed), xs)
        return out_plane[:, :P], packed[:, :self.nsym]

    # ------------------------------------------------------------------
    def _run(self, words, word_off, nbits, teacher, decode: bool):
        if self._weights is None:
            raise RuntimeError("call prepare(ent_params) first")
        return self._program(self._weights, words, word_off, nbits, teacher,
                             jnp.asarray(decode))

    def encode_planes(self, planes: np.ndarray):
        """planes: (B, npart, G, h, w) integer symbols. Returns a list of B
        (payload bytes, lane_nbytes) pairs (header handling is the caller's;
        see codec/container.py)."""
        B, L = self.B, self.L
        assert planes.shape == (B, self.npart, self.G, self.h, self.w)
        teacher = jnp.asarray(planes.reshape(B, self.P).astype(np.int32))
        words = jnp.zeros((B * self.NW,), jnp.uint32)
        word_off = jnp.zeros((B, L), jnp.int32)
        nbits = jnp.zeros((B, L), jnp.uint32)
        _, packed = self._run(words, word_off, nbits, teacher, decode=False)
        packed = np.asarray(packed)
        out = []
        loff = self.lane_sym_off.astype(np.int64)
        for b in range(B):
            payload, lane_nbytes = encode_lanes(packed[b][self.lane_perm],
                                                loff, TOTAL)
            assert (lane_nbytes.astype(np.int64) * 8
                    <= self.lane_counts * 16 + 16).all(), \
                "lane exceeded the static AC size bound"
            out.append((payload, lane_nbytes))
        return out

    def encode_files(self, planes: np.ndarray, fnames):
        """Encode (B, npart, G, h, w) symbol planes to self-describing
        container files (mode=scan); fnames may be shorter than B (padding
        slots are dropped). Returns file sizes."""
        from pseudocylindrical_convolution_tpu.codec import container
        streams = self.encode_planes(planes)
        flags = self.profile_flags
        sizes = []
        for (payload, lane_nbytes), fn in zip(streams, fnames):
            sizes.append(container.write_stream(
                fn, container.MODE_SCAN, self.npart, self.cfg.valid_dim,
                self.h, self.w, payload, lanes=self.L, batch=self.B,
                lane_nbytes=lane_nbytes, flags=flags,
                flags2=self.profile_flags2))
        return sizes

    def decode_files(self, fnames):
        """Decode <= B container files -> (len(fnames), npart, G, h, w)."""
        from pseudocylindrical_convolution_tpu.codec import container
        streams = []
        for fn in fnames:
            hdr = container.read_stream(fn)
            container.check_stream(hdr, fn, container.MODE_SCAN, self.npart,
                                   self.cfg.valid_dim, self.h, self.w)
            if hdr["lanes"] != self.L or hdr["batch"] != self.B:
                raise ValueError(
                    f"{fn}: stream was encoded for a (batch={hdr['batch']}, "
                    f"lanes={hdr['lanes']}) executable, decoder is "
                    f"(batch={self.B}, lanes={self.L})")
            want = (self.profile_flags, self.profile_flags2)
            got = (hdr.get("flags", 0), hdr.get("flags2", 0))
            if got != want:
                raise ValueError(
                    f"{fn}: stream profile flags {got} do not match this "
                    f"decoder's profile {want} (dtype {self.dtype})")
            streams.append((hdr["payload"], hdr["lane_nbytes"]))
        return self.decode_streams(streams)

    def decode_streams_device(self, streams):
        """streams: list of <= B (payload bytes, lane_nbytes) pairs.
        Dispatches the scan program and returns the (B, P) int32 symbol
        plane as a DEVICE array (async) -- callers chain further on-device
        work (e.g. the image reconstruction) without a host round trip."""
        B, L, NW = self.B, self.L, self.NW
        assert len(streams) <= B
        words = np.zeros((B, NW), np.uint32)
        nbits = np.zeros((B, L), np.uint32)
        for b, (payload, lane_nbytes) in enumerate(streams):
            lane_nbytes = np.asarray(lane_nbytes, np.int64)
            pos = 0
            for l in range(L):
                nb = int(lane_nbytes[l])
                lane = np.frombuffer(payload, np.uint8, count=nb, offset=pos)
                pos += nb
                wb = np.zeros(((nb + 3) // 4) * 4, np.uint8)
                wb[:nb] = lane
                w32 = wb.reshape(-1, 4).astype(np.uint32)
                off = int(self.word_off_1[l])
                words[b, off:off + w32.shape[0]] = (
                    (w32[:, 0] << 24) | (w32[:, 1] << 16)
                    | (w32[:, 2] << 8) | w32[:, 3])
                nbits[b, l] = nb * 8
        word_off = (self.word_off_1[None, :]
                    + (np.arange(B, dtype=np.int64)[:, None] * NW)
                    ).astype(np.int32)
        teacher = jnp.zeros((B, self.P), jnp.int32)
        plane, _ = self._run(jnp.asarray(words.reshape(-1)),
                             jnp.asarray(word_off), jnp.asarray(nbits),
                             teacher, decode=True)
        return plane

    def decode_streams(self, streams):
        """streams: list of <= B (payload bytes, lane_nbytes) pairs.
        Returns (B', npart, G, h, w) int32 symbol planes (host)."""
        nreq = len(streams)
        plane = self.decode_streams_device(streams)
        # symbols are < 256: transfer uint8 (4x less device->host traffic)
        plane = np.asarray(plane[:nreq].astype(jnp.uint8)).astype(np.int32)
        return plane.reshape(nreq, self.npart, self.G, self.h, self.w)


# ---------------------------------------------------------------------------
# Multi-device fan-out: one stream per device over a ('data',) mesh
# ---------------------------------------------------------------------------


class ShardedScanCodec:
    """Decode (or teacher-force-encode) D independent streams, one per mesh
    device, in the wall time of one: shard_map over a ('data',) mesh runs
    the B=1 scan program per shard with replicated weights; there are no
    collectives (per-stream math is independent), so an N-chip host gets
    N-fold aggregate codec throughput. Encode and decode share ONE wrapped
    executable (runtime decode flag), so sharded encode <-> sharded decode
    is bit-exact by construction; single-device <-> sharded bit-equality is
    additionally verified by tests/test_scan_multi.py on the CPU mesh."""

    def __init__(self, codec: "ScanWavefrontCodec", mesh):
        from jax.sharding import PartitionSpec as P
        assert codec.B == 1, "fan-out shards streams, use a B=1 codec"
        self.codec, self.mesh = codec, mesh
        self.D = int(np.prod(mesh.devices.shape))
        axis = mesh.axis_names[0]

        def call(weights, words, word_off, nbits, teacher, flag):
            return codec._program_impl(weights, words.reshape(-1), word_off,
                                       nbits, teacher, flag[0])

        sharded = jax.shard_map(
            call, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False)
        self._program = jax.jit(sharded)

    def _run(self, words, word_off, nbits, teacher, decode: bool):
        codec = self.codec
        if codec._weights is None:
            raise RuntimeError("call codec.prepare(ent_params) first")
        flag = jnp.full((self.D,), decode)
        return self._program(codec._weights, words, word_off, nbits, teacher,
                             flag)

    def decode_streams(self, streams):
        """streams: list of <= D (payload bytes, lane_nbytes) pairs.
        Returns (len(streams), npart, G, h, w) int32 symbol planes."""
        codec, D = self.codec, self.D
        assert len(streams) <= D
        L, NW = codec.L, codec.NW
        words = np.zeros((D, NW), np.uint32)
        nbits = np.zeros((D, L), np.uint32)
        for d, (payload, lane_nbytes) in enumerate(streams):
            # lanes are packed at the static worst-case word offsets the
            # scan program expects (codec.word_off_1)
            lane_nbytes = np.asarray(lane_nbytes, np.int64)
            pos = 0
            for l in range(L):
                n = int(lane_nbytes[l])
                lane = np.frombuffer(payload, np.uint8, count=n, offset=pos)
                pos += n
                wb = np.zeros(((n + 3) // 4) * 4, np.uint8)
                wb[:n] = lane
                w32 = wb.reshape(-1, 4).astype(np.uint32)
                off = int(codec.word_off_1[l])
                words[d, off:off + w32.shape[0]] = (
                    (w32[:, 0] << 24) | (w32[:, 1] << 16)
                    | (w32[:, 2] << 8) | w32[:, 3])
                nbits[d, l] = n * 8
        word_off = np.broadcast_to(codec.word_off_1[None, :],
                                   (D, L)).astype(np.int32).copy()
        teacher = jnp.zeros((D, codec.P), jnp.int32)
        plane, _ = self._run(jnp.asarray(words), jnp.asarray(word_off),
                             jnp.asarray(nbits), teacher, decode=True)
        plane = np.asarray(plane[:len(streams)].astype(jnp.uint8)).astype(
            np.int32)
        return plane.reshape(len(streams), codec.npart, codec.G, codec.h,
                             codec.w)

    def encode_planes(self, planes: np.ndarray):
        """planes: (D', npart, G, h, w) symbols, D' <= D. Returns a list of
        (payload bytes, lane_nbytes) pairs (same stream format/profile as
        the B=1 codec: batch=1 in the container header)."""
        codec, D = self.codec, self.D
        nreq = planes.shape[0]
        assert nreq <= D
        full = np.zeros((D,) + planes.shape[1:], planes.dtype)
        full[:nreq] = planes
        teacher = jnp.asarray(full.reshape(D, codec.P).astype(np.int32))
        words = jnp.zeros((D, codec.NW), jnp.uint32)
        word_off = jnp.zeros((D, codec.L), jnp.int32)
        nbits = jnp.zeros((D, codec.L), jnp.uint32)
        _, packed = self._run(words, word_off, nbits, teacher, decode=False)
        packed = np.asarray(packed)
        loff = codec.lane_sym_off.astype(np.int64)
        out = []
        for d in range(nreq):
            payload, lane_nbytes = encode_lanes(packed[d][codec.lane_perm],
                                                loff, TOTAL)
            out.append((payload, lane_nbytes))
        return out


# ---------------------------------------------------------------------------
# Image-level scan-mode API (the CLI's default codec mode)
# ---------------------------------------------------------------------------

_CODEC_CACHE = {}

# Defaults for the shipped executable profile; chosen by on-chip A/B
# (tools/prof_scan_variants.py). get_scan_codec falls back to chunks=1 when
# a config's group count is not divisible.
DEFAULT_CONV_CHUNKS = 4
# "pallas" won the round-5 on-chip A/B at the flagship config (3.01/3.06
# vs gather's 3.14/3.19 ms/step enc/dec, demo/ab/r5_pallas_ab_512_fixed.log)
# but its whole-buffer VMEM residency only fits sub-~9MB buffers
# (pallas_window.py); _pallas_fits gates the default per geometry and
# falls back to gather (e.g. 2048x4096, whose buffer is ~34 MB). Streams
# are self-describing (FLAG2_PALLASWIN), so decode always reconstructs
# the encoding profile regardless of the default.
DEFAULT_WINDOW_MODE = "pallas"
DEFAULT_HOIST = False
DEFAULT_PAD_MODE = "gather"


def _pallas_fits(cfg: CMPNetConfig, geom: Geometry, h: int, w: int,
                 dtype) -> bool:
    """Estimate whether the Pallas window kernel's resident buffer fits.

    The dominant VMEM cost is the flat layer buffer (Sbuf, 3*G*cpn) with
    lanes padded to a multiple of 128. Sbuf is estimated with the burst
    margins rounded up (the exact value comes from _burst_setup, which
    needs a constructed codec). Measured: the flagship 512x1024 buffer
    (8296 x 432 -> 8.5 MB padded bf16) compiles and runs; 16x that OOMs
    scoped VMEM (the fused kernel's 28.66M > 16M rejection)."""
    G = cfg.ngroup
    S = geom.npart * h * w
    sest = S + 2 * (G + 8 + geom.npart * h + 16) + 16
    ccpad = -(-3 * G * 3 // 128) * 128              # cpn=3, lanes padded
    return sest * ccpad * jnp.dtype(dtype).itemsize <= 9 * 1024 * 1024


def auto_lanes(geom: Geometry, h: int, w: int, G: int) -> int:
    """Pick the AC lane count for a geometry.

    Measured on a v5e (tools/prof_scan_variants.py + manual probes): the
    decode AC inner loop runs ceil(step_symbols/lanes) sequential rounds
    per wavefront step, but each round's cost scales ~linearly with the
    lane width at these sizes (the round kernel is throughput-, not
    latency-bound), so total AC time is nearly FLAT in L -- 512x1024
    decode 3.87/3.69/3.98 ms/step at L=256/512/1024; 2048x4096
    23.4/24.3 ms/step at L=256/2048 (scaling lanes with image size was
    tried and measured a wash-to-loss; at high res the sheared convs
    dominate the step anyway). L=256 sits within 5% of best everywhere,
    so it is the fixed choice; only tiny geometries scale DOWN (cap
    nsym/1000, floor 64) so test configs don't pay 256 lanes x ~5 B of
    termination on hundred-symbol streams."""
    _, counts, _ = wavefront_schedule(geom, h, w, G)
    nsym = float(counts.sum())
    cap = 1 << max(6, int(np.log2(max(1.0, nsym / 1000.0))))
    return int(min(256, cap))


def get_scan_codec(cfg: CMPNetConfig, geom: Geometry, h: int, w: int,
                   batch: int, lanes: int, dtype=jnp.bfloat16,
                   conv_chunks: int | None = None,
                   window_mode: str | None = None,
                   hoist: bool | None = None,
                   pad_mode: str | None = None) -> ScanWavefrontCodec:
    if conv_chunks is None:
        conv_chunks = DEFAULT_CONV_CHUNKS if cfg.ngroup % \
            DEFAULT_CONV_CHUNKS == 0 else 1
    if window_mode is None:
        window_mode = DEFAULT_WINDOW_MODE
        if window_mode == "pallas" and not _pallas_fits(cfg, geom, h, w,
                                                        dtype):
            window_mode = "gather"
    if hoist is None:
        hoist = DEFAULT_HOIST and window_mode == "gather"
    if pad_mode is None:
        pad_mode = DEFAULT_PAD_MODE if window_mode == "burst" else "gather"
    key = (cfg, geom, h, w, batch, lanes, jnp.dtype(dtype), conv_chunks,
           window_mode, hoist, pad_mode)
    codec = _CODEC_CACHE.get(key)
    if codec is None:
        codec = ScanWavefrontCodec(cfg, geom, h, w, batch=batch, lanes=lanes,
                                   dtype=dtype, conv_chunks=conv_chunks,
                                   window_mode=window_mode, hoist=hoist,
                                   pad_mode=pad_mode)
        _CODEC_CACHE[key] = codec
    return codec


def _prepared(codec: ScanWavefrontCodec, ent_params):
    if getattr(codec, "_prepared_src", None) is not ent_params:
        codec.prepare(ent_params)
        codec._prepared_src = ent_params
    return codec


def scan_encode_images(params, images, cfg: CMPNetConfig, geom: Geometry,
                       fnames, batch: int = 1, lanes: int | None = None):
    """Encode a list of (1, 3, H, W) images to scan-mode container files.

    Pipelined: all chunks' latent transforms and scan programs are
    dispatched asynchronously; the host arithmetic-coder packing of chunk k
    overlaps the device running chunk k+1. batch=1 measured fastest
    per image on a v5e (the scan step is compute-bound, so batching images
    buys nothing; it only helps amortize very small latents). lanes=None
    picks `auto_lanes`: 256 at real image sizes (quarters the sequential
    AC rounds vs 64 -- decode 6.0 -> 5.25 ms/step on chip -- while wider
    lanes measured flat-to-worse; see auto_lanes), scaled down for tiny
    test geometries. The stream header records the choice; decoders
    follow the header.
    """
    from pseudocylindrical_convolution_tpu.codec import container
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        _encode_latents_plane)
    assert len(images) == len(fnames)
    planes = []
    for x in images:
        hcode, _, _ = _encode_latents_plane(params, x, cfg, geom)
        nb, G, h, w = hcode.shape
        planes.append(hcode.astype(jnp.int32).reshape(
            geom.npart, G, h, w))                     # device, async
    h, w = planes[0].shape[2:]
    if lanes is None:
        lanes = auto_lanes(geom, h, w, cfg.ngroup)
    codec = _prepared(get_scan_codec(cfg, geom, h, w, batch, lanes),
                      params["ent"])
    pending = []
    for o in range(0, len(planes), batch):
        chunk = planes[o:o + batch]
        full = jnp.stack(chunk + [chunk[-1]] * (batch - len(chunk)))
        teacher = full.reshape(batch, codec.P)
        words = jnp.zeros((batch * codec.NW,), jnp.uint32)
        zoff = jnp.zeros((batch, codec.L), jnp.int32)
        znb = jnp.zeros((batch, codec.L), jnp.uint32)
        _, packed = codec._run(words, zoff, znb, teacher, decode=False)
        pending.append((packed, fnames[o:o + batch]))
    flags = codec.profile_flags
    sizes = []
    loff = codec.lane_sym_off.astype(np.int64)
    for packed, fns in pending:
        packed = np.asarray(packed)
        for b, fn in enumerate(fns):
            payload, lane_nbytes = encode_lanes(
                packed[b][codec.lane_perm], loff, TOTAL)
            assert (lane_nbytes.astype(np.int64) * 8
                    <= codec.lane_counts * 16 + 16).all(), \
                "lane exceeded the static AC size bound"
            sizes.append(container.write_stream(
                fn, container.MODE_SCAN, codec.npart, cfg.valid_dim,
                h, w, payload, lanes=codec.L, batch=codec.B,
                lane_nbytes=lane_nbytes, flags=flags,
                flags2=codec.profile_flags2))
    return sizes


def scan_decode_images(params, cfg: CMPNetConfig, geom: Geometry, fnames,
                       image_hw=(512, 1024), pixel_fmt: str = "f32"):
    """Decode scan-mode container files -> (len(fnames), 3, H, W).

    The whole chain (scan decode -> latent dequant -> synthesis transform)
    stays on device per chunk, and all chunks are dispatched before any
    device->host pull, so host-side stream prep and image download overlap
    device compute.

    pixel_fmt "f32" returns float32 reconstructions (metric-exact vs the
    reference's float tensors); "u8" converts to 8-bit ON DEVICE with the
    PNG-write semantics (clip to [0,1], *255, truncate) and transfers 4x
    fewer bytes -- the right choice when the destination is an image file
    (the axon tunnel moves ~20 MB/s device->host, so a 512x1024 float
    pull costs ~0.3 s/image vs ~0.08 at uint8).
    """
    from pseudocylindrical_convolution_tpu.codec import container
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        _decode_image_from_latents)
    H, W = image_hw
    h = H // geom.npart // 8
    w = W // 8
    hdr0 = container.read_stream(fnames[0])
    container.check_stream(hdr0, fnames[0], container.MODE_SCAN, geom.npart,
                           cfg.valid_dim, h, w)
    flags = hdr0.get("flags", 0)
    flags2 = hdr0.get("flags2", 0)
    dtype = jnp.bfloat16 if flags & container.FLAG_BF16 else jnp.float32
    window_mode = ("slab" if flags & container.FLAG_SLAB
                   else "burst" if flags & container.FLAG_BURST
                   else "pallas" if flags2 & container.FLAG2_PALLASWIN
                   else ("fusedu" if flags2 & container.FLAG2_FUSEDUNROLL
                         else "fused") if flags2 & container.FLAG2_FUSEDSTEP
                   else "gather")
    conv_chunks = (flags >> container.CHUNKS_SHIFT) + 1
    hoist = bool(flags & container.FLAG_HOIST)
    pad_mode = ("mm" if flags2 & container.FLAG2_MMPAD else "gather")
    codec = _prepared(get_scan_codec(cfg, geom, h, w, int(hdr0["batch"]),
                                     int(hdr0["lanes"]), dtype=dtype,
                                     conv_chunks=conv_chunks,
                                     window_mode=window_mode, hoist=hoist,
                                     pad_mode=pad_mode),
                      params["ent"])
    pending = []
    for o in range(0, len(fnames), codec.B):
        chunk = fnames[o:o + codec.B]
        streams = []
        for fn in chunk:
            hdr = container.read_stream(fn)
            container.check_stream(hdr, fn, container.MODE_SCAN, geom.npart,
                                   cfg.valid_dim, h, w)
            streams.append((hdr["payload"], hdr["lane_nbytes"]))
        plane = codec.decode_streams_device(streams)      # (B, P) device
        hcode = plane.astype(jnp.float32).reshape(
            codec.B * geom.npart, cfg.ngroup, h, w)
        rec = _decode_image_from_latents(params, hcode, cfg, geom)
        if pixel_fmt == "u8":
            rec = jnp.clip(rec * jnp.float32(255.0), 0.0, 255.0).astype(
                jnp.uint8)
        pending.append((rec, len(chunk)))
    return np.concatenate([np.asarray(rec)[:n] for rec, n in pending])
