"""Encode/decode pipelines: analysis/synthesis transform + GMM entropy coding.

Counterpart of pseudo_codec.py's PseudoEncoder/PseudoDecoder/EntEncoder/
EntDecoder (pseudo_codec.py:68-213), restructured TPU-first:

  * ENCODE is fully parallel: all symbols are known, so the causal entropy
    network runs densely in ONE jitted forward, CDF tables for the whole
    image are built on device in wavefront order, and the arithmetic coder
    consumes them in a single host call. (The reference steps the wavefront
    238 times at encode; that serialization is only fundamental for decode.)

  * DECODE is sequential per wavefront step: the dense causal network is
    evaluated on the partial symbol plane and the current step's CDF rows are
    extracted; the host arithmetic decoder returns the step's symbols which
    are scattered back. Causality (v5 first layer, v6 hidden, causal pads)
    guarantees the dense evaluation equals the reference's incremental
    wavefront network at every extracted cell.
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
from pseudocylindrical_convolution_tpu.codec.wavefront import (
    symbol_gather_index, wavefront_schedule)

NSTEP = 8          # quantizer bins / AC symbols
BIAS = 3.5
TOTAL = 65536


def _param_gather(raw, flat_sym, ngroup, ngauss=3):
    """Gather per-symbol raw GMM params in coding order.

    raw: dict of (npart, ngroup*ngauss, h, w); flat_sym: (n,) indices into a
    (npart, ngroup, h, w) layout. Returns (w, d, m) each (n, ngauss).
    """

    def one(t):
        npart, c, h, w = t.shape
        t = t.reshape(npart, ngroup, ngauss, h, w).transpose(0, 1, 3, 4, 2)
        return t.reshape(-1, ngauss)[flat_sym]

    return one(raw["weight"]), one(raw["delta"]), one(raw["mean"])


@functools.partial(jax.jit, static_argnums=(2, 3))
def _encode_tables(params, x, cfg: CMPNetConfig, geom: Geometry):
    """Image -> (symbols, CDF tables) in coding order, plus the latent plane."""
    from pseudocylindrical_convolution_tpu.ops.gmm_table import gmm_cdf_table
    hcode = cmpnet_encode_latents(params, x, cfg, geom)
    _, _, h, w = hcode.shape
    raw = entropy_net_raw(params["ent"], hcode - cfg.mean_val, geom,
                          cfg.ngroup)
    flat = jnp.asarray(symbol_gather_index(geom, h, w, cfg.ngroup))
    wr, dr, mr = _param_gather(raw, flat, cfg.ngroup)
    tables = gmm_cdf_table(wr, dr, mr, NSTEP, BIAS, TOTAL)
    syms = hcode.reshape(-1)[flat].astype(jnp.int32)
    return syms, tables, hcode


@functools.partial(jax.jit, static_argnums=(2, 3))
def _encode_ranges(params, x, cfg: CMPNetConfig, geom: Geometry):
    """Image -> (n, 3) per-symbol (sym_low, sym_high, total) int32 rows.

    Gathering the coder's per-symbol range on device shrinks the host
    transfer to 3 ints/symbol (the AC state machine needs nothing else).
    """
    syms, tables, _ = _encode_tables(params, x, cfg, geom)
    n = syms.shape[0]
    rows = jnp.arange(n)
    low = tables[rows, syms]
    high = tables[rows, syms + 1]
    total = tables[:, NSTEP]
    return jnp.stack([low, high, total], axis=1)


def encode_image(params, x, cfg: CMPNetConfig, geom: Geometry,
                 fname: str) -> int:
    """Encode (1, 3, H, W) image to ``fname``; returns byte size."""
    ranges = np.asarray(_encode_ranges(params, x, cfg, geom))
    coder = Coder(fname)
    coder.start_encoder()
    coder.encode_ranges(ranges)
    return coder.end_encoder()


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3, 4))
def _decode_step_tables(ent_params, buf, flat_pad, cfg: CMPNetConfig,
                        geom: Geometry):
    """Dense causal net on the partial plane -> CDF rows for given cells.

    buf: (npart, ngroup, h, w) net input (decoded symbols - bias, else 0).
    flat_pad: (maxlen,) padded flat cell indices for this step.
    """
    from pseudocylindrical_convolution_tpu.ops.gmm_table import gmm_cdf_table
    raw = entropy_net_raw(ent_params, buf, geom, cfg.ngroup)
    wr, dr, mr = _param_gather(raw, flat_pad, cfg.ngroup)
    return gmm_cdf_table(wr, dr, mr, NSTEP, BIAS, TOTAL)


@jax.jit
def _scatter_symbols(buf, flat_pad, syms_pad, valid):
    """Scatter (sym - BIAS) into the flat buffer at flat_pad where valid."""
    flatbuf = buf.reshape(-1)
    vals = jnp.where(valid, syms_pad.astype(jnp.float32) - BIAS, 0.0)
    # drop duplicate padding writes: padded idx entries repeat index 0; make
    # them no-ops by adding 0 there
    flatbuf = flatbuf.at[flat_pad].add(vals)
    return flatbuf.reshape(buf.shape)


def decode_latents(ent_params, cfg: CMPNetConfig, geom: Geometry, h: int,
                   w: int, fname: str):
    """Sequential wavefront decode -> (npart, ngroup, h, w) symbol plane."""
    order, counts, nsteps = wavefront_schedule(geom, h, w, cfg.ngroup)
    flat = symbol_gather_index(geom, h, w, cfg.ngroup)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    maxlen = int(counts.max())
    coder = Coder(fname)
    coder.start_decoder()
    buf = jnp.zeros((geom.npart, cfg.ngroup, h, w), jnp.float32)
    out = np.zeros(flat.shape[0], np.int32)
    for z in range(nsteps):
        n = int(counts[z])
        if n == 0:
            continue
        cells = flat[offsets[z]: offsets[z] + n]
        pad = np.zeros(maxlen, np.int32)
        pad[:n] = cells
        tables = np.asarray(_decode_step_tables(ent_params, buf,
                                                jnp.asarray(pad), cfg, geom))
        syms = coder.decodes(tables[:n], NSTEP, n)
        out[offsets[z]: offsets[z] + n] = syms
        spad = np.zeros(maxlen, np.int32)
        spad[:n] = syms
        valid = np.zeros(maxlen, bool)
        valid[:n] = True
        buf = _scatter_symbols(buf, jnp.asarray(pad), jnp.asarray(spad),
                               jnp.asarray(valid))
    plane = np.zeros(geom.npart * cfg.ngroup * h * w, np.float32)
    plane[flat] = out
    return plane.reshape(geom.npart, cfg.ngroup, h, w)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _decode_image_from_latents(params, hcode, cfg: CMPNetConfig,
                               geom: Geometry):
    return cmpnet_decode_latents(params, hcode, cfg, geom)


def decode_image(params, cfg: CMPNetConfig, geom: Geometry, fname: str,
                 image_hw=(512, 1024)):
    """Decode ``fname`` -> (1, 3, H, W) image."""
    H, W = image_hw
    h = H // geom.npart // 8
    w = W // 8
    plane = decode_latents(params["ent"], cfg, geom, h, w, fname)
    hcode = jnp.asarray(plane)
    return _decode_image_from_latents(params, hcode, cfg, geom)
