"""Encode/decode pipelines: analysis/synthesis transform + GMM entropy coding.

Counterpart of pseudo_codec.py's PseudoEncoder/PseudoDecoder/EntEncoder/
EntDecoder (pseudo_codec.py:68-213), restructured TPU-first:

  * ENCODE is fully parallel: all symbols are known, so the causal entropy
    network runs densely in ONE device pass, per-symbol coder ranges are
    gathered on device, and the arithmetic coder consumes them in a single
    host call. (The reference steps the wavefront 238 times at encode; that
    serialization is only fundamental for decode.)

  * DECODE is sequential per wavefront step, but evaluates THE SAME jitted
    dense table program as the encoder, on the partial symbol plane.

Bit-exactness contract: encoder and decoder must derive IDENTICAL integer
CDF tables. Two different XLA programs computing the "same" math can differ
by 1 ulp (fusion/reduction order) and desync the arithmetic coder -- the
reference sidesteps this by running the same incremental kernels on both
sides. Here both sides call one compiled program (`_table_program`): the
causal v5/v6 weight masks and causal pads multiply future symbols by exact
0.0, so evaluating on a partial plane yields bit-identical step-z outputs to
the full-plane evaluation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_decode_latents, cmpnet_encode_latents)
from pseudocylindrical_convolution_tpu.models.entropy import entropy_net_raw
from pseudocylindrical_convolution_tpu.codec.coder_bridge import Coder
from pseudocylindrical_convolution_tpu.codec import container
from pseudocylindrical_convolution_tpu.codec.wavefront import (
    symbol_gather_index, wavefront_schedule)

NSTEP = 8          # quantizer bins / AC symbols
BIAS = 3.5
TOTAL = 65536


def _table_body(ent_params, plane, cfg: CMPNetConfig, geom: Geometry):
    """Symbol plane -> int32 CDF tables (B, nsym, NSTEP+1) in coding order.

    plane: (B, npart, ngroup, h, w) holding (symbol - BIAS) at known cells
    and 0 elsewhere. Shared by the encoder's one-shot program and the
    decoder's fused step program.
    """
    from pseudocylindrical_convolution_tpu.ops.gmm_table import gmm_cdf_table
    B, npart, ngroup, h, w = plane.shape
    nb = plane.reshape(B * npart, ngroup, h, w)
    raw = entropy_net_raw(ent_params, nb, geom, ngroup)
    flat = jnp.asarray(symbol_gather_index(geom, h, w, ngroup))

    def per_image(raw_b):
        def one(t):
            c = t.shape[1]
            ng = c // ngroup
            t = t.reshape(npart, ngroup, ng, h, w).transpose(0, 1, 3, 4, 2)
            return t.reshape(-1, ng)[flat]
        wr = one(raw_b["weight"])
        dr = one(raw_b["delta"])
        mr = one(raw_b["mean"])
        return gmm_cdf_table(wr, dr, mr, NSTEP, BIAS, TOTAL)

    raw_r = {k: v.reshape(B, npart, *v.shape[1:]) for k, v in raw.items()}
    return jax.vmap(per_image)(raw_r)


_table_program = jax.jit(_table_body, static_argnums=(2, 3))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _encode_latents_plane(params, x, cfg: CMPNetConfig, geom: Geometry):
    """Image batch -> (hcode, biased plane, symbols in coding order)."""
    hcode = cmpnet_encode_latents(params, x, cfg, geom)
    B = x.shape[0]
    _, _, h, w = hcode.shape
    plane = hcode.reshape(B, geom.npart, cfg.ngroup, h, w) - BIAS
    flat = jnp.asarray(symbol_gather_index(geom, h, w, cfg.ngroup))
    syms = jax.vmap(lambda p: p.reshape(-1)[flat] + BIAS)(plane)
    return hcode, plane, syms.astype(jnp.int32)


@jax.jit
def _gather_ranges(tables, syms):
    """(B, n, NSTEP+1), (B, n) -> (B, n, 3) (low, high, total) rows."""
    def per(t, s):
        rows = jnp.arange(s.shape[0])
        return jnp.stack([t[rows, s], t[rows, s + 1], t[:, NSTEP]], axis=1)
    return jax.vmap(per)(tables, syms)


@jax.jit
def _gather_ranges_packed(tables, syms):
    """-> (B, n) uint32, v = low | ((high-1) << 16); total is always 65536
    after the monotonic repair, so it needs no transfer."""
    def per(t, s):
        rows = jnp.arange(s.shape[0])
        low = t[rows, s].astype(jnp.uint32)
        high = t[rows, s + 1].astype(jnp.uint32)
        return low | ((high - 1) << 16)
    return jax.vmap(per)(tables, syms)


def _encode_dispatch(params, x, cfg: CMPNetConfig, geom: Geometry):
    """Launch the device side of an encode; returns (packed async, (h, w))."""
    _, plane, syms = _encode_latents_plane(params, x, cfg, geom)
    tables = _table_program(params["ent"], plane, cfg, geom)
    return _gather_ranges_packed(tables, syms), plane.shape[3:5]


def _write_dense(fname, packed_row, geom: Geometry, cfg: CMPNetConfig, h, w):
    coder = Coder(fname)
    coder.start_encoder()
    coder.encode_packed(packed_row, TOTAL)
    payload = coder.end_encoder_buf()
    return container.write_stream(fname, container.MODE_DENSE, geom.npart,
                                  cfg.valid_dim, h, w, payload)


def encode_image(params, x, cfg: CMPNetConfig, geom: Geometry, fnames):
    """Encode (B, 3, H, W) images to per-image bitstream files.

    fnames: str (B must be 1) or list of B names. Returns byte size(s).

    B > 1 inputs are dispatched as B async single-image programs: the decoder
    always evaluates the B=1 table program, and the bit-exactness contract
    requires the encoder to have used the same program shape (see module
    docstring), so a batched table program would produce undecodable streams.
    """
    single = isinstance(fnames, str)
    if single:
        fnames = [fnames]
    assert x.shape[0] == len(fnames), "one bitstream file per image"
    if x.shape[0] > 1:
        return encode_images(params, [x[b:b + 1] for b in range(x.shape[0])],
                             cfg, geom, fnames)
    fut, (h, w) = _encode_dispatch(params, x, cfg, geom)
    packed = np.asarray(fut)
    sizes = [_write_dense(fn, packed[b], geom, cfg, h, w)
             for b, fn in enumerate(fnames)]
    return sizes[0] if single else sizes


def encode_images(params, images, cfg: CMPNetConfig, geom: Geometry,
                  fnames) -> list:
    """Pipelined encode of a list of (1, 3, H, W) images: all device work is
    dispatched up front (async), host AC drains behind it."""
    futs = [_encode_dispatch(params, x, cfg, geom) for x in images]
    sizes = []
    for (fut, (h, w)), fn in zip(futs, fnames):
        packed = np.asarray(fut)
        sizes.append(_write_dense(fn, packed[0], geom, cfg, h, w))
    return sizes


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(2,))
def _slice_step_tables(tables, offset, pad_to: int):
    """Contiguous step rows [offset, offset+pad_to) of (B, nsym, NSTEP+1).

    Tables are padded so the slice never clamps near the end."""
    return jax.vmap(lambda t: jax.lax.dynamic_slice(
        jnp.pad(t, ((0, pad_to), (0, 0))), (offset, 0),
        (pad_to, t.shape[1])))(tables)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _decode_step_fused(ent_params, plane, prev_pad, prev_syms, prev_valid,
                       offset, maxlen: int, cfg: CMPNetConfig,
                       geom: Geometry):
    """Fused decode step: scatter previous symbols, run the causal network,
    build CDF rows for THIS step's window only -- one dispatch and one small
    transfer per step.

    Returns (plane, step_tb) with step_tb (B, maxlen, NSTEP-1) uint16: only
    the interior CDF entries travel (entry 0 is always 0 and entry NSTEP is
    always TOTAL after the monotonic repair; interior entries are in
    [1, TOTAL-1] and fit uint16).

    Bit-exactness: the network is the same code as the encoder's
    `_table_body`; the per-row CDF math is elementwise + fixed tiny
    reductions, so gathering the step window before the CDF build yields the
    same integer rows. Enforced empirically by tests and the TPU CLI drive.
    """
    from pseudocylindrical_convolution_tpu.ops.gmm_table import gmm_cdf_table
    B, npart, ngroup, h, w = plane.shape
    flatp = plane.reshape(B, -1)
    vals = jnp.where(prev_valid, prev_syms.astype(jnp.float32) - BIAS, 0.0)
    flatp = jax.vmap(lambda fb, ix, v: fb.at[ix].add(v))(flatp, prev_pad,
                                                         vals)
    plane = flatp.reshape(plane.shape)
    nb = plane.reshape(B * npart, ngroup, h, w)
    raw = entropy_net_raw(ent_params, nb, geom, ngroup)
    flat = jnp.asarray(symbol_gather_index(geom, h, w, ngroup))
    flat_win = jax.lax.dynamic_slice(
        jnp.pad(flat, (0, maxlen)), (offset,), (maxlen,))

    def per_image(raw_b):
        def one(t):
            c = t.shape[1]
            ng = c // ngroup
            t = t.reshape(npart, ngroup, ng, h, w).transpose(0, 1, 3, 4, 2)
            return t.reshape(-1, ng)[flat_win]
        tb = gmm_cdf_table(one(raw_b["weight"]), one(raw_b["delta"]),
                           one(raw_b["mean"]), NSTEP, BIAS, TOTAL)
        return tb[:, 1:NSTEP].astype(jnp.uint16)

    raw_r = {k: v.reshape(B, npart, *v.shape[1:]) for k, v in raw.items()}
    return plane, jax.vmap(per_image)(raw_r)


def _unpack_step_tables(tb16: np.ndarray) -> np.ndarray:
    """(n, NSTEP-1) uint16 interior entries -> (n, NSTEP+1) int32 rows."""
    n = tb16.shape[0]
    out = np.empty((n, NSTEP + 1), np.int32)
    out[:, 0] = 0
    out[:, 1:NSTEP] = tb16.astype(np.int32)
    out[:, NSTEP] = TOTAL
    return out


@jax.jit
def _scatter_prev(plane, prev_pad, prev_syms, prev_valid):
    B = plane.shape[0]
    flat = plane.reshape(B, -1)
    vals = jnp.where(prev_valid, prev_syms.astype(jnp.float32) - BIAS, 0.0)
    flat = jax.vmap(lambda fb, ix, v: fb.at[ix].add(v))(flat, prev_pad, vals)
    return flat.reshape(plane.shape)


def decode_latents(ent_params, cfg: CMPNetConfig, geom: Geometry, h: int,
                   w: int, fnames):
    """Sequential wavefront decode of one or more bitstreams (in lockstep).

    fnames: str or list. Returns (npart, ngroup, h, w) for a single name,
    else (B, npart, ngroup, h, w).

    NOTE: a bitstream decodes bit-exactly when the decode batch size equals
    the encode batch size (the table program is compiled per batch size and
    XLA numerics are only guaranteed identical within one program). The
    default single-image paths on both sides use B=1.
    """
    single = isinstance(fnames, str)
    if single:
        fnames = [fnames]
    B = len(fnames)
    order, counts, nsteps = wavefront_schedule(geom, h, w, cfg.ngroup)
    flat = symbol_gather_index(geom, h, w, cfg.ngroup)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    maxlen = int(counts.max())
    coders = []
    for fn in fnames:
        hdr = container.read_stream(fn)
        container.check_stream(hdr, fn, container.MODE_DENSE, geom.npart,
                               cfg.valid_dim, h, w)
        c = Coder(fn)
        c.start_decoder_buf(hdr["payload"])
        coders.append(c)
    # one (1, ...) plane per stream so every stream runs through the SAME
    # compiled B=1 table program the encoder used (bit-exactness contract);
    # per-stream device calls are dispatched asynchronously, so the host
    # round-trip latency is still amortized across the batch.
    planes_d = [jnp.zeros((1, geom.npart, cfg.ngroup, h, w), jnp.float32)
                for _ in range(B)]
    out = np.zeros((B, flat.shape[0]), np.int32)
    # CRITICAL: device calls are dispatched asynchronously and jax may read
    # host numpy buffers lazily (zero-copy aliasing / deferred transfer).
    # Never mutate a numpy array after passing it in -- the prev_* buffers
    # are re-allocated fresh every step instead.
    prev_syms = np.zeros((B, maxlen), np.int32)
    prev_valid = np.zeros((B, maxlen), bool)
    prev_pad = np.zeros((B, maxlen), np.int32)
    for z in range(nsteps):
        n = int(counts[z])
        if n == 0:
            for b in range(B):
                planes_d[b] = _scatter_prev(
                    planes_d[b], jnp.asarray(prev_pad[b:b + 1]),
                    jnp.asarray(prev_syms[b:b + 1]),
                    jnp.asarray(prev_valid[b:b + 1]))
            prev_valid = np.zeros((B, maxlen), bool)
            continue
        futs = []
        for b in range(B):
            planes_d[b], step_tb = _decode_step_fused(
                ent_params, planes_d[b], jnp.asarray(prev_pad[b:b + 1]),
                jnp.asarray(prev_syms[b:b + 1]),
                jnp.asarray(prev_valid[b:b + 1]), int(offsets[z]),
                maxlen, cfg, geom)
            futs.append(step_tb)
        pad = np.zeros((B, maxlen), np.int32)
        pad[:, :n] = flat[offsets[z]: offsets[z] + n]
        new_syms = np.zeros((B, maxlen), np.int32)
        for b in range(B):
            step_tb = _unpack_step_tables(np.asarray(futs[b])[0, :n])
            syms = coders[b].decodes(step_tb, NSTEP, n)
            out[b, offsets[z]: offsets[z] + n] = syms
            new_syms[b, :n] = syms
        prev_pad = pad
        prev_syms = new_syms
        prev_valid = np.zeros((B, maxlen), bool)
        prev_valid[:, :n] = True
    planes = np.zeros((B, geom.npart * cfg.ngroup * h * w), np.float32)
    for b in range(B):
        planes[b, flat] = out[b]
    planes = planes.reshape(B, geom.npart, cfg.ngroup, h, w)
    return planes[0] if single else planes


@functools.partial(jax.jit, static_argnums=(2, 3))
def _decode_image_from_latents(params, hcode, cfg: CMPNetConfig,
                               geom: Geometry):
    return cmpnet_decode_latents(params, hcode, cfg, geom)


def decode_image(params, cfg: CMPNetConfig, geom: Geometry, fnames,
                 image_hw=(512, 1024)):
    """Decode bitstream(s) -> (B, 3, H, W) images (B=1 for a single name)."""
    H, W = image_hw
    h = H // geom.npart // 8
    w = W // 8
    planes = decode_latents(params["ent"], cfg, geom, h, w, fnames)
    if planes.ndim == 4:
        planes = planes[None]
    B = planes.shape[0]
    hcode = jnp.asarray(planes).reshape(B * geom.npart, cfg.ngroup, h, w)
    return _decode_image_from_latents(params, hcode, cfg, geom)


# Back-compat helpers used by tests/tools -----------------------------------
# NOTE: these compose the separately-jitted pieces; wrapping them in one jit
# would inline (re-fuse) `_table_program` into a new program and break the
# encoder/decoder bit-exactness contract described above.


def _encode_tables(params, x, cfg: CMPNetConfig, geom: Geometry):
    """Image -> (symbols, CDF tables, latents); single-image (B=1) path."""
    hcode, plane, syms = _encode_latents_plane(params, x, cfg, geom)
    tables = _table_program(params["ent"], plane, cfg, geom)
    return syms[0], tables[0], hcode


def _encode_ranges(params, x, cfg: CMPNetConfig, geom: Geometry):
    _, plane, syms = _encode_latents_plane(params, x, cfg, geom)
    tables = _table_program(params["ent"], plane, cfg, geom)
    return _gather_ranges(tables, syms)[0]
