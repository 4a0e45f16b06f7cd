"""End-to-end codec oracle: encode -> bitstream -> sequential decode must be
bit-exact (the reference's de-facto integration test, pseudo_codec.py --test).
Also covers dense<->wavefront causal equivalence implicitly: the encoder
computes CDFs densely from the full latents while the decoder recomputes them
step-by-step from partial latents; any causality leak breaks bit-exactness.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.codec.pipeline import (
    _encode_tables, decode_image, decode_latents, encode_image)
from pseudocylindrical_convolution_tpu.codec.wavefront import (
    wavefront_schedule)

CFG = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
GEOM = CFG.geometry()


def test_wavefront_schedule_properties():
    order, counts, nsteps = wavefront_schedule(GEOM, 2, 16, CFG.ngroup)
    h_out = 2 * GEOM.npart
    assert nsteps == h_out + 16 + CFG.ngroup - 2
    # each symbol exactly once
    assert len(order) == counts.sum()
    seen = set(map(tuple, order))
    hindex = GEOM.hindex(h_out, 16)
    total = sum(int(hindex[i // 2]) for i in range(h_out)) * CFG.ngroup
    assert len(seen) == len(order) == total
    # steps consistent: i+j+g == step
    off = 0
    for z in range(nsteps):
        for (i, j, g) in order[off: off + counts[z]]:
            assert i + j + g == z
        off += counts[z]


def test_encode_decode_bit_exact(tmp_path):
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 128))
    fn = str(tmp_path / "code.bin")
    size = encode_image(params, x, CFG, GEOM, fn)
    assert size > 0 and os.path.getsize(fn) == size
    syms, tables, hcode = _encode_tables(params, x, CFG, GEOM)
    plane = decode_latents(params["ent"], CFG, GEOM, hcode.shape[2],
                           hcode.shape[3], fn)
    np.testing.assert_array_equal(plane,
                                  np.asarray(hcode).reshape(plane.shape))
    rec = decode_image(params, CFG, GEOM, fn, (64, 128))
    assert rec.shape == (1, 3, 64, 128)
    assert np.isfinite(np.asarray(rec)).all()


def test_scan_decode_u8_matches_f32(tmp_path):
    """pixel_fmt='u8' must equal the PNG conversion of the f32 output
    exactly (clip to [0,1], *255, truncate) -- the on-device conversion
    only moves WHERE the cast happens, never what the written image is."""
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        scan_decode_images, scan_encode_images)
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 64, 128))
    fn = str(tmp_path / "s.bin")
    scan_encode_images(params, [x], CFG, GEOM, [fn])
    rec_f = scan_decode_images(params, CFG, GEOM, [fn], (64, 128))
    rec_u = scan_decode_images(params, CFG, GEOM, [fn], (64, 128),
                               pixel_fmt="u8")
    assert rec_u.dtype == np.uint8
    want = np.clip(rec_f * 255.0, 0.0, 255.0).astype(np.uint8)
    np.testing.assert_array_equal(rec_u, want)


def test_batched_decode_bit_exact(tmp_path):
    """Multiple bitstreams decoded in lockstep must each be bit-exact
    (each stream runs the same compiled B=1 table program as its encoder)."""
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    fns, planes_true = [], []
    for i in range(2):
        x = jax.random.uniform(jax.random.PRNGKey(10 + i), (1, 3, 64, 128))
        fn = str(tmp_path / f"c{i}.bin")
        encode_image(params, x, CFG, GEOM, fn)
        _, _, hcode = _encode_tables(params, x, CFG, GEOM)
        planes_true.append(np.asarray(hcode))
        fns.append(fn)
    planes = decode_latents(params["ent"], CFG, GEOM, 2, 16, fns)
    for i in range(2):
        np.testing.assert_array_equal(
            planes[i], planes_true[i].reshape(planes[i].shape))
