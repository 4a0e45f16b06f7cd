"""Incremental wavefront codec mode.

The dense decode path (codec/pipeline.py) re-evaluates the whole causal
network every step (~250x redundant FLOPs). This module implements the
reference's incremental idea (extension/entropy_conv_cuda_v2.cu /
entropy_ctx_pad_run2_cuda.cu) in TPU-native form:

  * every layer keeps a persistent activation buffer; a step computes ONLY
    the new frontier cells (one anti-diagonal per channel-group);
  * the 5x5 stencil collapses along anti-diagonals: for a cell at
    (group g, band b, row r, col j = z - g - h*b - r), the tap (kh, kw)
    reads slab column m = (G + h - 2) - g - r + kw -- INDEPENDENT of z and
    b. So a step is: per band, gather a narrow causally-padded slab, then
    25 tap-contractions expressed as static flipped slices + small einsums
    (MXU work), then scatter the new cells;
  * the per-step pad plans of the reference (entropy_ctx_pad_run2) are
    subsumed by composing the causal 2-tap pad tables into the slab gather.

Bit-exactness: encoder and decoder run the SAME jitted step function (the
encoder teacher-forces the known symbols, dispatching all steps
asynchronously), so the integer CDF tables match by construction -- a
stronger guarantee than the dense mode's same-program argument. The two
modes produce different bitstreams; encode and decode must use the same
mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig
from pseudocylindrical_convolution_tpu.ops.masks import conv_mask
from pseudocylindrical_convolution_tpu.ops.pad import build_pad_tables
from pseudocylindrical_convolution_tpu.codec.coder_bridge import Coder
from pseudocylindrical_convolution_tpu.codec.wavefront import (
    wavefront_schedule)
from pseudocylindrical_convolution_tpu.codec.pipeline import (
    BIAS, NSTEP, TOTAL)

_SUBNETS = ("weight_net", "delta_net", "mean_net")


def stack_step_weights(ent_params, ngroup: int, cpn: int = 3,
                       num_gaussian: int = 3):
    """Per-layer causally-masked weights stacked over the 3 subnets.

    Returns a list of 12 layer dicts {"w": (3, G, cout, cin, 5, 5),
    "b": (3, G*cout), "a": (3, G*cout) or None} in execution order:
    L0, then (conv1, conv2) for residual blocks 1..5, then the output conv.
    """
    layers = []

    def grab(getter, cin, cout, hidden, act):
        mask = conv_mask(6 if hidden else 5, ngroup * cout, ngroup * cin, 5,
                         ngroup)
        w = jnp.stack([jnp.asarray(getter(ent_params[s])["conv"]["weight"])
                       * mask for s in _SUBNETS])
        w = w.reshape(3, ngroup, cout, ngroup * cin, 5, 5)
        b = jnp.stack([jnp.asarray(getter(ent_params[s])["conv"]["bias"])
                       for s in _SUBNETS])
        a = None
        if act:
            a = jnp.stack([jnp.asarray(getter(ent_params[s])["act"]["weight"])
                           for s in _SUBNETS])
        layers.append({"w": w, "b": b, "a": a})

    grab(lambda p: p["net"]["0"], 1, cpn, hidden=False, act=True)
    for r in range(1, 6):
        grab(lambda p, r=r: p["net"][str(r)]["conv1"], cpn, cpn, True, True)
        grab(lambda p, r=r: p["net"][str(r)]["conv2"], cpn, cpn, True, True)
    grab(lambda p: p["net"]["6"], cpn, num_gaussian, hidden=True, act=False)
    return layers


@functools.lru_cache(maxsize=None)
def _static_tables(geom: Geometry, h: int, w: int):
    """Causal pad tables reshaped for slab gathering."""
    idx, wgt = build_pad_tables(geom, h, w, 2, causal=True)
    # pad the column axis with an extra sentinel column (weight 0) so
    # out-of-range slab columns can be clamped there
    npart = geom.npart
    idxp = np.concatenate([idx, np.zeros((2, npart, h + 4, 1), np.int32)],
                          axis=3)
    wgtp = np.concatenate([wgt, np.zeros((2, npart, h + 4, 1), np.float32)],
                          axis=3)
    idxp.setflags(write=False)
    wgtp.setflags(write=False)
    return idxp, wgtp  # numpy (cached); converted to constants in-trace


class WavefrontCodec:
    """Incremental wavefront encoder/decoder for one latent geometry."""

    def __init__(self, cfg: CMPNetConfig, geom: Geometry, h: int, w: int,
                 cpn: int = 3, num_gaussian: int = 3):
        self.cfg, self.geom, self.h, self.w = cfg, geom, h, w
        self.cpn, self.ng = cpn, num_gaussian
        G = cfg.ngroup
        npart = geom.npart
        self.G, self.npart = G, npart
        self.h_out = h * npart
        self.SW = G + h + 3                     # slab width (taps inclusive)
        order, counts, nsteps = wavefront_schedule(geom, h, w, G)
        self.counts, self.nsteps = counts, nsteps
        self.offsets = np.concatenate([[0], np.cumsum(counts)])
        i, j, g = order[:, 0], order[:, 1], order[:, 2]
        self.grid_idx = (g * self.h_out + i).astype(np.int64)   # coding order
        self.plane_idx = ((i // h * G + g) * h + i % h) * w + j  # (npart,G,h,w)
        self.maxlen = int(counts.max())
        self.hindex = geom.hindex(self.h_out, w)
        self._step = jax.jit(
            self._step_impl,
            donate_argnums=(1,),
        )

    # ------------------------------------------------------------------
    def init_buffers(self):
        """Input plane + 11 persistent activation buffers, channel-major
        flat layout (C, npart*h*w) [input: (G, S)]."""
        S = self.npart * self.h * self.w
        C = self.G * self.cpn
        bufs = [jnp.zeros((self.G, S), jnp.float32)]          # symbols
        for _ in range(11):                                    # y0,(c1,y)x5
            bufs.append(jnp.zeros((3, C, S), jnp.float32))
        return bufs

    # ------------------------------------------------------------------
    def _slab(self, buf, z, C):
        """Gather the causally-padded slab (..., npart, h+4, SW) for step z.

        buf: (3, C, S) or (C, S) channel-major flat buffer.
        """
        idxp_np, wgtp_np = _static_tables(self.geom, self.h, self.w)
        idxp, wgtp = jnp.asarray(idxp_np), jnp.asarray(wgtp_np)
        G, h, w, npart, SW = self.G, self.h, self.w, self.npart, self.SW
        b = jnp.arange(npart)
        colstart = z - h * b - (G - 1) - (h - 1) - 2          # (npart,)
        cprime = colstart[:, None] + jnp.arange(SW)[None, :] + 2
        oob = (cprime < 0) | (cprime >= w + 4)
        cc = jnp.where(oob, w + 4, cprime)                     # sentinel col
        ccb = jnp.broadcast_to(cc[:, None, :], (npart, h + 4, SW))
        # gather pad tables at (b, r', cc)
        g0 = jnp.take_along_axis(idxp[0], ccb, axis=2)
        w0 = jnp.take_along_axis(wgtp[0], ccb, axis=2)
        g1 = jnp.take_along_axis(idxp[1], ccb, axis=2)
        w1 = jnp.take_along_axis(wgtp[1], ccb, axis=2)
        slab = (jnp.take(buf, g0, axis=-1) * w0
                + jnp.take(buf, g1, axis=-1) * w1)
        return slab  # (..., C, npart, h+4, SW)

    def _frontier_conv(self, buf, z, layer):
        """New frontier cells for one conv layer.

        buf: (3, C, S) [or (G, S) input]; returns (3, npart, h, G, cout).

        Double-skew restructure: with kslab[t, u] = slab[t, u - t], the tap
        (kh, kw) for cell (g, r) reads kslab[r + kh, (G+h-2) - g + kh + kw]
        -- the column depends only on g and e = kh + kw. One 9-slice
        diagonal view G2 plus h small einsums replace the naive 25-tap loop.
        """
        G, h, cpn = self.G, self.h, self.cpn
        W, bias, act = layer["w"], layer["b"], layer["a"]
        cout = W.shape[2]
        slab = self._slab(buf, z, None)
        if slab.ndim == 4:                     # input layer: (G, npart, ...)
            slab = jnp.broadcast_to(slab[None], (3,) + slab.shape)
        # slab: (3, C, npart, h+4, SW) -> (3, npart, C, h+4, SW)
        slab = slab.transpose(0, 2, 1, 3, 4)
        hp4 = h + 4
        # kslab[..., t, u] = slab[..., t, u - t]
        kslab = jnp.stack(
            [jnp.pad(slab[:, :, :, t, :], ((0, 0), (0, 0), (0, 0),
                                           (t, hp4 - t)))
             for t in range(hp4)], axis=3)     # (3, npart, C, h+4, SW+h+4)
        q0 = G + h - 2
        # G2[..., v, g, e] = kslab[..., v, q0 + e - g], g ascending
        G2 = jnp.stack(
            [jnp.flip(kslab[:, :, :, :, q0 + e - (G - 1): q0 + e + 1],
                      axis=-1) for e in range(9)], axis=-1)
        # We[s, g, o, c, kh, e] = W[s, g, o, c, kh, e - kh]
        We = jnp.stack(
            [jnp.pad(W[:, :, :, :, kh, :], ((0, 0),) * 4 + ((kh, 4 - kh),))
             for kh in range(5)], axis=4)      # (3, G, cout, C, 5, 9)
        outs = []
        for r in range(h):
            outs.append(jnp.einsum(
                "sgocke,sbckge->sbgo", We, G2[:, :, :, r: r + 5],
                preferred_element_type=jnp.float32))
        out = jnp.stack(outs, axis=2)                    # (3, npart, h, G, co)
        bb = bias.reshape(3, 1, 1, G, cout)
        out = out + bb
        if act is not None:
            aa = act.reshape(3, 1, 1, G, cout)
            out = jnp.where(out >= 0, out, aa * out)
        return out

    def _cell_flat_idx(self, z):
        """Flat (C*S) scatter indices + validity for frontier cells.

        Returns (idx (npart, h, G, cpn), valid (npart, h, G, 1))."""
        G, h, w, cpn = self.G, self.h, self.w, self.cpn
        npart, S = self.npart, self.npart * self.h * self.w
        b = jnp.arange(npart)[:, None, None]
        r = jnp.arange(h)[None, :, None]
        g = jnp.arange(G)[None, None, :]
        j = z - g - (h * b + r)
        wl = jnp.asarray(np.asarray(self.hindex))[:, None, None]
        valid = (j >= 0) & (j < wl)
        jc = jnp.clip(j, 0, w - 1)
        flat = (b * h + r) * w + jc                     # (npart, h, G)
        o = jnp.arange(cpn)[None, None, None, :]
        cidx = (g[..., None] * cpn + o) * S + flat[..., None]
        return cidx, valid[..., None]

    def _step_impl(self, weights, bufs, prev_syms, z):
        """One wavefront step. prev_syms: (positions, symbols, valid) packed
        updates for step z-1, each (maxlen,).
        Returns (bufs, table_grid (G*h_out, NSTEP-1) uint16)."""
        from pseudocylindrical_convolution_tpu.ops.gmm_table import (
            gmm_cdf_table)
        G, h, w, cpn = self.G, self.h, self.w, self.cpn
        npart, S = self.npart, self.npart * self.h * self.w
        # 1) scatter previous symbols into the input plane
        #    prev entries: (maxlen,) flat (npart,G,h,w) positions + symbols
        pos, syms, pvalid = prev_syms
        vals = jnp.where(pvalid, syms.astype(jnp.float32) - BIAS, 0.0)
        # input buffer layout (G, S): plane position -> (chan g, flat s)
        gch = pos // (h * w) % G
        bnd = pos // (h * w * G)
        rw = pos % (h * w)
        flat = bnd * h * w + rw
        buf_in = bufs[0].reshape(-1)
        buf_in = buf_in.at[gch * S + flat].add(vals)
        bufs[0] = buf_in.reshape(G, S)
        # 2) frontier conv chain
        cidx, valid = self._cell_flat_idx(z)

        def scatter(buf, cells):
            # cells (3, npart, h, G, cpn) -> buffer (3, C*S)
            v = jnp.where(valid[None], cells, 0.0)
            fb = buf.reshape(3, -1)
            ix = cidx.reshape(-1)
            fb = jax.vmap(lambda fbs, vv: fbs.at[ix].add(vv.reshape(-1)))(
                fb, v)
            return fb.reshape(buf.shape)

        y0 = self._frontier_conv(bufs[0], z, weights[0])
        bufs[1] = scatter(bufs[1], y0)
        ycells = y0
        for r in range(5):
            li = 1 + 2 * r
            c1 = self._frontier_conv(bufs[1 + 2 * r], z, weights[li])
            bufs[2 + 2 * r] = scatter(bufs[2 + 2 * r], c1)
            c2 = self._frontier_conv(bufs[2 + 2 * r], z, weights[li + 1])
            ycells = ycells + c2
            bufs[3 + 2 * r] = scatter(bufs[3 + 2 * r], ycells)
        out = self._frontier_conv(bufs[11], z, weights[11])
        # 3) CDF rows for the whole frontier grid, ordered (g, i)
        # out: (3, npart, h, G, ng) -> (G, h_out, ng) per param
        prm = out.transpose(0, 3, 1, 2, 4).reshape(3, G * self.h_out, self.ng)
        tb = gmm_cdf_table(prm[0], prm[1], prm[2], NSTEP, BIAS, TOTAL)
        return bufs, tb[:, 1:NSTEP].astype(jnp.uint16)

    # ------------------------------------------------------------------
    def _run(self, payloads, teacher_plane=None):
        """Drive the step loop. With teacher_plane (B=1 numpy symbols plane
        (npart, G, h, w)): encode mode, all steps dispatched async. Without:
        decode mode, blocking on each step's tables; payloads = list of raw
        AC payload bytes (container header already stripped)."""
        maxlen = self.maxlen
        decode = teacher_plane is None
        coders = []
        if decode:
            for data in payloads:
                c = Coder("<buffer>")
                c.start_decoder_buf(data)
                coders.append(c)
        assert not decode or len(payloads) == 1, "B=1 for now"
        weights = self._weights
        bufs = self.init_buffers()
        out_syms = np.zeros(self.grid_idx.shape[0], np.int32)
        tables_async = []
        # CRITICAL: the step is dispatched asynchronously, and jax may read
        # host numpy buffers lazily (zero-copy aliasing and/or deferred
        # transfer). Never mutate a numpy array after passing it to the
        # step -- allocate FRESH prev_* buffers every iteration instead.
        prev_pos = np.zeros(maxlen, np.int32)
        prev_sym = np.zeros(maxlen, np.int32)
        prev_val = np.zeros(maxlen, bool)
        for z in range(self.nsteps):
            n = int(self.counts[z])
            o = self.offsets[z]
            bufs, tb = self._step(weights, bufs,
                                  (jnp.asarray(prev_pos),
                                   jnp.asarray(prev_sym),
                                   jnp.asarray(prev_val)), z)
            if n == 0:
                prev_val = np.zeros(maxlen, bool)
                continue
            gsel = self.grid_idx[o: o + n]
            if decode:
                rows = np.asarray(tb)[gsel]
                step_tb = np.empty((n, NSTEP + 1), np.int32)
                step_tb[:, 0] = 0
                step_tb[:, 1:NSTEP] = rows
                step_tb[:, NSTEP] = TOTAL
                syms = coders[0].decodes(step_tb, NSTEP, n)
            else:
                tables_async.append((z, tb))
                syms = teacher_plane.reshape(-1)[self.plane_idx[o: o + n]
                                                 ].astype(np.int32)
            out_syms[o: o + n] = syms
            prev_pos = np.zeros(maxlen, np.int32)
            prev_sym = np.zeros(maxlen, np.int32)
            prev_val = np.zeros(maxlen, bool)
            prev_pos[:n] = self.plane_idx[o: o + n]
            prev_sym[:n] = syms
            prev_val[:n] = True
        if decode:
            plane = np.zeros(self.npart * self.G * self.h * self.w,
                             np.float32)
            plane[self.plane_idx] = out_syms
            return plane.reshape(self.npart, self.G, self.h, self.w)
        return out_syms, tables_async

    def prepare(self, ent_params):
        self._weights = stack_step_weights(ent_params, self.G, self.cpn,
                                           self.ng)

    def encode(self, hcode_plane: np.ndarray, fname: str) -> int:
        """hcode_plane: (npart, G, h, w) integer symbols (numpy). Writes a
        self-describing MODE_INCR container file; returns its size."""
        from pseudocylindrical_convolution_tpu.codec import container
        syms, tables_async = self._run(None, teacher_plane=hcode_plane)
        coder = Coder("<buffer>")
        coder.start_encoder()
        for (z, tb) in tables_async:
            n = int(self.counts[z])
            o = self.offsets[z]
            rows = np.asarray(tb)[self.grid_idx[o: o + n]]
            step_tb = np.empty((n, NSTEP + 1), np.int32)
            step_tb[:, 0] = 0
            step_tb[:, 1:NSTEP] = rows
            step_tb[:, NSTEP] = TOTAL
            coder.encodes(step_tb, NSTEP, syms[o: o + n], n)
        payload = coder.end_encoder_buf()
        return container.write_stream(fname, container.MODE_INCR, self.npart,
                                      self.cfg.valid_dim, self.h, self.w,
                                      payload)

    def decode(self, fname: str) -> np.ndarray:
        from pseudocylindrical_convolution_tpu.codec import container
        hdr = container.read_stream(fname)
        container.check_stream(hdr, fname, container.MODE_INCR, self.npart,
                               self.cfg.valid_dim, self.h, self.w)
        return self._run([hdr["payload"]])


# ---------------------------------------------------------------------------
# Image-level incremental-mode API (CLI `--mode incremental`)
# ---------------------------------------------------------------------------

_INCR_CACHE = {}


def get_incremental_codec(cfg: CMPNetConfig, geom: Geometry, h: int,
                          w: int) -> WavefrontCodec:
    key = (cfg, geom, h, w)
    codec = _INCR_CACHE.get(key)
    if codec is None:
        codec = WavefrontCodec(cfg, geom, h, w)
        _INCR_CACHE[key] = codec
    return codec


def _prepared(codec: WavefrontCodec, ent_params):
    if getattr(codec, "_prepared_src", None) is not ent_params:
        codec.prepare(ent_params)
        codec._prepared_src = ent_params
    return codec


def incr_encode_images(params, images, cfg: CMPNetConfig, geom: Geometry,
                       fnames):
    """Encode (1, 3, H, W) images to incremental-mode container files."""
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        _encode_latents_plane)
    assert len(images) == len(fnames)
    sizes = []
    codec = None
    for x, fn in zip(images, fnames):
        hcode, _, _ = _encode_latents_plane(params, x, cfg, geom)
        nb, G, h, w = hcode.shape
        if codec is None:
            codec = _prepared(get_incremental_codec(cfg, geom, h, w),
                              params["ent"])
        plane = np.asarray(hcode).reshape(geom.npart, G, h, w)
        sizes.append(codec.encode(plane, fn))
    return sizes


def incr_decode_images(params, cfg: CMPNetConfig, geom: Geometry, fnames,
                       image_hw=(512, 1024)):
    """Decode incremental-mode container files -> (len(fnames), 3, H, W)."""
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        _decode_image_from_latents)
    H, W = image_hw
    h = H // geom.npart // 8
    w = W // 8
    codec = _prepared(get_incremental_codec(cfg, geom, h, w), params["ent"])
    recs = []
    for fn in fnames:
        plane = codec.decode(fn)
        hcode = jnp.asarray(plane.reshape(geom.npart, cfg.ngroup, h, w),
                            jnp.float32)
        recs.append(np.asarray(
            _decode_image_from_latents(params, hcode, cfg, geom)))
    return np.concatenate(recs)
