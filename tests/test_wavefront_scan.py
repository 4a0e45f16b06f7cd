"""Single-program wavefront codec (codec/wavefront_scan.py).

Covers the full round-2 decode design: scan over steps, skew-window conv
frontier network, on-device lane-interleaved arithmetic decoding, and the
teacher-forced same-executable encoder.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
    ScanWavefrontCodec)
from pseudocylindrical_convolution_tpu.codec.pipeline import (
    BIAS, _table_program)
from pseudocylindrical_convolution_tpu.codec.wavefront import (
    symbol_gather_index)

H, W = 2, 8
B, L = 2, 4


@pytest.fixture(scope="module")
def setup():
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)
    # fp32 profile: required by the dense-table equality contract below
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32)
    codec.prepare(params["ent"])
    hindex = geom.hindex(H * 4, W)
    mask = np.zeros((4, cfg.ngroup, H, W), bool)
    for b in range(4):
        mask[b, :, :, :int(hindex[b])] = True
    return cfg, geom, params, codec, mask


@pytest.fixture(scope="module")
def setup_bf16(setup):
    cfg, geom, params, _, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.bfloat16)
    codec.prepare(params["ent"])
    return cfg, geom, params, codec, mask


def _roundtrip(cfg, codec, mask, seed=0):
    rng = np.random.default_rng(seed)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    streams = codec.encode_planes(planes)
    dec = codec.decode_streams(streams)
    assert ((dec == planes) | ~mask[None]).all()

    # one real stream in a B-shaped executable slot (dummy co-batch)
    dec1 = codec.decode_streams([streams[1]])
    assert ((dec1[0] == planes[1]) | ~mask).all()

    # streams are self-contained: re-decoding in a different order works
    dec_r = codec.decode_streams([streams[1], streams[0]])
    assert ((dec_r[0] == planes[1]) | ~mask).all()
    assert ((dec_r[1] == planes[0]) | ~mask).all()


@pytest.mark.quick
def test_roundtrip_and_slot_decode(setup):
    cfg, geom, params, codec, mask = setup
    _roundtrip(cfg, codec, mask)


@pytest.mark.quick
def test_roundtrip_bf16_profile(setup_bf16):
    """The bf16 activation profile (the default, container.FLAG_BF16) must
    round-trip bit-exactly too -- bit-exactness is per-executable."""
    cfg, geom, params, codec, mask = setup_bf16
    _roundtrip(cfg, codec, mask, seed=7)


def test_encode_decode_share_one_compiled_executable(setup):
    """THE load-bearing bit-exactness contract: encode (teacher-forced) and
    decode run the SAME compiled executable -- the mode flag is a traced
    runtime input, never a static argument, so the CDF tables the encoder
    coded with are identical to the decoder's by construction (the property
    the reference gets from replaying identical CUDA kernels).

    Two assertions make the structural guarantee a tested invariant:
    1. the jit cache holds exactly ONE executable after an encode AND a
       decode have both run (a static/donated mode arg would make it two);
    2. the lowered HLO for the decode=True and decode=False signatures is
       byte-identical (the flag is data, not specialization).
    """
    cfg, geom, params, codec, mask = setup
    rng = np.random.default_rng(12)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    streams = codec.encode_planes(planes)          # decode=False path
    codec.decode_streams(streams)                  # decode=True path
    assert codec._program._cache_size() == 1

    args = (codec._weights, jnp.zeros((B * codec.NW,), jnp.uint32),
            jnp.zeros((B, L), jnp.int32), jnp.zeros((B, L), jnp.uint32),
            jnp.asarray(planes.reshape(B, -1)))
    hlo_enc = codec._program.lower(*args, jnp.asarray(False)).as_text()
    hlo_dec = codec._program.lower(*args, jnp.asarray(True)).as_text()
    assert hlo_enc == hlo_dec


def test_scan_tables_match_dense_program(setup):
    """The skew-window conv step must compute the same causal network as the
    dense table program: coder ranges should agree exactly (both are fp32
    convs over identical inputs; a rare off-by-one from reassociated
    reductions is tolerated, a structural error shifts many entries).

    NOTE the tolerance here is deliberate and NOT load-bearing for the
    bitstream: what protects decodability is that encoder and decoder
    dispatch one shared executable (test_encode_decode_share_one_compiled_
    executable above). This test only cross-checks the scan network against
    the independently-written dense program; ±1-ulp CDF divergence between
    two DIFFERENT XLA programs is expected reassociation noise."""
    cfg, geom, params, codec, mask = setup
    rng = np.random.default_rng(3)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)

    teacher = jnp.asarray(planes.reshape(B, -1))
    words = jnp.zeros((B * codec.NW,), jnp.uint32)
    _, packed = codec._run(words, jnp.zeros((B, L), jnp.int32),
                           jnp.zeros((B, L), jnp.uint32), teacher,
                           decode=False)
    packed = np.asarray(packed)

    flat = symbol_gather_index(geom, H, W, cfg.ngroup)
    mism = 0
    for b in range(B):
        plane_b = jnp.asarray(planes[b:b + 1].astype(np.float32)) - BIAS
        tables = np.asarray(
            _table_program(params["ent"], plane_b, cfg, geom))[0]
        syms = planes[b].reshape(-1)[flat]
        low = tables[np.arange(len(syms)), syms].astype(np.uint32)
        high = tables[np.arange(len(syms)), syms + 1].astype(np.uint32)
        pd = low | ((high - 1) << 16)
        d_lo = np.abs((packed[b] & 0xFFFF).astype(int)
                      - (pd & 0xFFFF).astype(int))
        d_hi = np.abs((packed[b] >> 16).astype(int) - (pd >> 16).astype(int))
        assert max(d_lo.max(), d_hi.max()) <= 1
        mism += int((packed[b] != pd).sum())
    assert mism <= 0.01 * B * codec.nsym


def test_scan_wide_geometry_roundtrip():
    """Scaling-shaped config: npart=8 bands, 4x32 latent tiles (66 wavefront
    steps, ragged hindex across 8 bands). Covers the high-res scaling path's
    geometry handling (SURVEY §5) at CPU-feasible size."""
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=8)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(2), cfg)
    h, w = 4, 32
    codec = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=8)
    codec.prepare(params["ent"])
    hindex = geom.hindex(h * 8, w)
    mask = np.zeros((8, cfg.ngroup, h, w), bool)
    for b in range(8):
        mask[b, :, :, :int(hindex[b])] = True
    rng = np.random.default_rng(11)
    planes = rng.integers(0, 8, (1, 8, cfg.ngroup, h, w)).astype(np.int32)
    streams = codec.encode_planes(planes)
    dec = codec.decode_streams(streams)
    assert ((dec == planes) | ~mask[None]).all()


def test_corrupt_stream_decodes_garbage_not_crash(setup):
    cfg, geom, params, codec, mask = setup
    rng = np.random.default_rng(5)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    streams = codec.encode_planes(planes)
    payload, lane_nbytes = streams[0]
    bad = bytearray(payload)
    if len(bad) > 2:
        bad[1] ^= 0xFF
    dec = codec.decode_streams([(bytes(bad), lane_nbytes)])
    assert dec.shape == (1, 4, cfg.ngroup, H, W)
    assert ((dec >= 0) & (dec <= 7)).all()


def test_roundtrip_conv_chunks(setup):
    """conv_chunks > 1 (the redundancy-cut executable profile) must still
    round-trip bit-exactly and agree with the unchunked program's coder
    ranges (same fp32 math, reassociated)."""
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, conv_chunks=2)
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=13)

    rng = np.random.default_rng(17)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    teacher = jnp.asarray(planes.reshape(B, -1))

    def ranges(cd):
        words = jnp.zeros((B * cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((B, L), jnp.int32),
                            jnp.zeros((B, L), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    p0, p1 = ranges(codec0), ranges(codec)
    d_lo = np.abs((p0 & 0xFFFF).astype(int) - (p1 & 0xFFFF).astype(int))
    d_hi = np.abs((p0 >> 16).astype(int) - (p1 >> 16).astype(int))
    assert max(d_lo.max(), d_hi.max()) <= 1
    assert (p0 != p1).sum() <= 0.01 * p0.size


@pytest.mark.quick
def test_roundtrip_window_slab(setup):
    """window_mode='slab' (padded rows + per-band dynamic-slice windows,
    deposit-materialized circular wrap) must round-trip bit-exactly and
    agree with the gather-mode program's coder ranges."""
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, window_mode="slab")
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=23)

    rng = np.random.default_rng(29)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    teacher = jnp.asarray(planes.reshape(B, -1))

    def ranges(cd):
        words = jnp.zeros((B * cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((B, L), jnp.int32),
                            jnp.zeros((B, L), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    p0, p1 = ranges(codec0), ranges(codec)
    d_lo = np.abs((p0 & 0xFFFF).astype(int) - (p1 & 0xFFFF).astype(int))
    d_hi = np.abs((p0 >> 16).astype(int) - (p1 >> 16).astype(int))
    assert max(d_lo.max(), d_hi.max()) <= 1
    assert (p0 != p1).sum() <= 0.01 * p0.size


def test_roundtrip_window_slab_wide():
    """Slab mode on the ragged 8-band wide geometry (hindex spread) --
    exercises per-band wrap materialization and slab clamping."""
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=8)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(2), cfg)
    h, w = 4, 32
    codec = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=8,
                               window_mode="slab")
    codec.prepare(params["ent"])
    hindex = geom.hindex(h * 8, w)
    mask = np.zeros((8, cfg.ngroup, h, w), bool)
    for b in range(8):
        mask[b, :, :, :int(hindex[b])] = True
    rng = np.random.default_rng(31)
    planes = rng.integers(0, 8, (1, 8, cfg.ngroup, h, w)).astype(np.int32)
    streams = codec.encode_planes(planes)
    dec = codec.decode_streams(streams)
    assert ((dec == planes) | ~mask[None]).all()


@pytest.mark.quick
def test_roundtrip_window_burst(setup):
    """window_mode='burst' (one contiguous run-gather per (band, row) +
    <=6 table-patched columns) must produce BIT-IDENTICAL coder ranges to
    the gather-mode program -- the decomposition is audited at build time
    to reproduce the pad tables exactly -- and round-trip."""
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, window_mode="burst")
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=43)

    rng = np.random.default_rng(47)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    teacher = jnp.asarray(planes.reshape(B, -1))

    def ranges(cd):
        words = jnp.zeros((B * cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((B, L), jnp.int32),
                            jnp.zeros((B, L), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    np.testing.assert_array_equal(ranges(codec0), ranges(codec))


def test_roundtrip_window_burst_wide():
    """Burst mode on the ragged 8-band wide geometry (spread hindex, incl.
    full-width and narrow bands): exercises the wrap-patch dedupe (wl == w
    and wl == w - 1 collisions) and the margin bounds; bf16 profile."""
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=8)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(2), cfg)
    h, w = 4, 32
    codec = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=8,
                               window_mode="burst")
    codec.prepare(params["ent"])
    hindex = geom.hindex(h * 8, w)
    mask = np.zeros((8, cfg.ngroup, h, w), bool)
    for b in range(8):
        mask[b, :, :, :int(hindex[b])] = True
    rng = np.random.default_rng(53)
    planes = rng.integers(0, 8, (1, 8, cfg.ngroup, h, w)).astype(np.int32)
    streams = codec.encode_planes(planes)
    dec = codec.decode_streams(streams)
    assert ((dec == planes) | ~mask[None]).all()


def test_roundtrip_hoist(setup):
    """hoist mode (merged buffer, one stacked interior gather + per-layer
    frontier patches) must produce BIT-IDENTICAL coder ranges to the
    per-layer gather program (the window values are the same exact
    gathers/adds) and round-trip."""
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, hoist=True)
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=37)

    rng = np.random.default_rng(41)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    teacher = jnp.asarray(planes.reshape(B, -1))

    def ranges(cd):
        words = jnp.zeros((B * cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((B, L), jnp.int32),
                            jnp.zeros((B, L), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    np.testing.assert_array_equal(ranges(codec0), ranges(codec))


def test_roundtrip_hoist_wrap_alias():
    """Narrow pole bands (hindex < g+5) put the circular-wrap alias patch
    slices inside the window -- the hardest hoist-correctness corner."""
    cfg = CMPNetConfig(valid_dim=32, channels=8, code_channels=32, npart=4)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(5), cfg)
    h, w = 2, 8
    hindex = geom.hindex(h * 4, w)
    assert int(min(hindex)) < cfg.ngroup + 4   # aliases actually in-window
    c0 = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=8,
                            dtype=jnp.float32)
    c0.prepare(params["ent"])
    c1 = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=8,
                            dtype=jnp.float32, hoist=True)
    c1.prepare(params["ent"])
    rng = np.random.default_rng(13)
    planes = rng.integers(0, 8, (1, 4, cfg.ngroup, h, w)).astype(np.int32)
    for b in range(4):
        planes[:, b, :, :, hindex[b]:] = 0
    teacher = jnp.asarray(planes.reshape(1, -1))

    def ranges(cd):
        words = jnp.zeros((cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((1, 8), jnp.int32),
                            jnp.zeros((1, 8), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    np.testing.assert_array_equal(ranges(c0), ranges(c1))
    mask = np.zeros((4, cfg.ngroup, h, w), bool)
    for b in range(4):
        mask[b, :, :, :int(hindex[b])] = True
    dec = c1.decode_streams(c1.encode_planes(planes))
    assert ((dec == planes) | ~mask[None]).all()


def test_auto_lanes_policy():
    """auto_lanes: 256 at real image sizes (wider lanes measured flat-to-
    worse on chip -- the round kernel cost scales with lane width), scaled
    down for tiny test geometries (cap nsym/1000, floor 64)."""
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        auto_lanes)
    from pseudocylindrical_convolution_tpu.geometry import Geometry
    g = Geometry(npart=16, opt=True, config_file="/nonexistent")
    assert auto_lanes(g, 4, 128, 48) == 256
    assert auto_lanes(g, 16, 512, 48) == 256
    g4 = Geometry(npart=4, opt=True, config_file="/nonexistent")
    assert auto_lanes(g4, 2, 16, 2) == 64


def test_roundtrip_burst_chunks(setup):
    """burst window + conv_chunks=2 combined (the candidate shipped
    profile): bit-identical coder ranges to the plain gather program and a
    clean roundtrip."""
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, window_mode="burst",
                               conv_chunks=2)
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=59)

    rng = np.random.default_rng(61)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    teacher = jnp.asarray(planes.reshape(B, -1))

    def ranges(cd):
        words = jnp.zeros((B * cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((B, L), jnp.int32),
                            jnp.zeros((B, L), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    np.testing.assert_array_equal(ranges(codec0), ranges(codec))


def test_pad_rows_mm_matches_gather(setup):
    """pad_mode='mm' (one-hot selection matmuls) must produce values equal
    to the 2-tap table gathers at EVERY step, for f32 and bf16 buffers."""
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, window_mode="burst",
                               pad_mode="mm")
    rng = np.random.default_rng(71)
    CC = 3 * cfg.ngroup * codec.cpn
    buf = jnp.asarray(rng.standard_normal((B, codec.Sbuf, CC)), jnp.float32)
    for z in range(codec.nsteps):
        g = codec._pad_rows_g(buf, jnp.int32(z))
        m = codec._pad_rows_mm(buf, jnp.int32(z))
        np.testing.assert_array_equal(np.asarray(g), np.asarray(m),
                                      err_msg=f"step {z}")
    codecb = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                                dtype=jnp.bfloat16, window_mode="burst",
                                pad_mode="mm")
    bufb = buf.astype(jnp.bfloat16)
    for z in range(0, codecb.nsteps, 3):
        g = codecb._pad_rows_g(bufb, jnp.int32(z))
        m = codecb._pad_rows_mm(bufb, jnp.int32(z))
        np.testing.assert_array_equal(
            np.asarray(g, np.float32), np.asarray(m, np.float32),
            err_msg=f"bf16 step {z}")


def test_roundtrip_burst_mmpad(setup):
    """burst interior + matmul pads + chunked convs (candidate profile):
    bit-identical coder ranges to the plain gather program, clean
    roundtrip, and the container records FLAG2_MMPAD."""
    from pseudocylindrical_convolution_tpu.codec import container
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, window_mode="burst",
                               conv_chunks=2, pad_mode="mm")
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=73)

    rng = np.random.default_rng(79)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    teacher = jnp.asarray(planes.reshape(B, -1))

    def ranges(cd):
        words = jnp.zeros((B * cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((B, L), jnp.int32),
                            jnp.zeros((B, L), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    np.testing.assert_array_equal(ranges(codec0), ranges(codec))

    # container profile: mm-pad streams are rejected by plain decoders
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fns = [os.path.join(td, f"s{i}.bin") for i in range(B)]
        codec.encode_files(planes, fns)
        hdr = container.read_stream(fns[0])
        assert hdr["flags2"] & container.FLAG2_MMPAD
        got = codec.decode_files(fns)
        assert ((got == planes) | ~mask[None]).all()
        plain = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                                   dtype=jnp.float32, window_mode="burst",
                                   conv_chunks=2)
        plain.prepare(params["ent"])
        with pytest.raises(ValueError, match="profile"):
            plain.decode_files(fns)


def test_pallas_window_matches_burst(setup):
    """window_mode='pallas' (VMEM kernel, interpret mode off-TPU) must
    reproduce the burst-mode window exactly at every step, for both the
    hidden-layer and the input-plane channel widths."""
    cfg, geom, params, codec0, mask = setup
    cb = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                            dtype=jnp.float32, window_mode="burst")
    cp = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                            dtype=jnp.float32, window_mode="pallas")
    rng = np.random.default_rng(83)
    for CC in (3 * cfg.ngroup * cp.cpn, cfg.ngroup):
        buf = jnp.asarray(
            rng.standard_normal((B, cp.Sbuf, CC)).astype(np.float32))
        for z in range(cp.nsteps):
            mid = cb._interior_burst(buf, jnp.int32(z))
            pads = cb._pad_rows_g(buf, jnp.int32(z))
            want = jnp.concatenate(
                [pads[:, :, 0:2], mid, pads[:, :, 2:4]], axis=2)
            got = cp._window_pallas(buf, jnp.int32(z))
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got),
                                          err_msg=f"CC={CC} step {z}")


@pytest.mark.quick
def test_roundtrip_pallas_window(setup):
    """Pallas-window profile: bit-identical coder ranges to the gather
    program, clean roundtrip, FLAG2_PALLASWIN recorded and enforced."""
    from pseudocylindrical_convolution_tpu.codec import container
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, window_mode="pallas",
                               conv_chunks=2)
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=89)

    rng = np.random.default_rng(97)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    teacher = jnp.asarray(planes.reshape(B, -1))

    def ranges(cd):
        words = jnp.zeros((B * cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((B, L), jnp.int32),
                            jnp.zeros((B, L), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    np.testing.assert_array_equal(ranges(codec0), ranges(codec))

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fns = [os.path.join(td, f"s{i}.bin") for i in range(B)]
        codec.encode_files(planes, fns)
        hdr = container.read_stream(fns[0])
        assert hdr["flags2"] & container.FLAG2_PALLASWIN
        got = codec.decode_files(fns)
        assert ((got == planes) | ~mask[None]).all()


def test_pallas_window_wide_geometry_roundtrip():
    """Pallas window at the scaling-shaped config (npart=8, 4x32 tiles,
    ragged hindex): bit-exact roundtrip and range-equality with the plain
    gather program in bf16 (the shipped dtype)."""
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=8)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(2), cfg)
    h, w = 4, 32
    c0 = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=8,
                            dtype=jnp.bfloat16)
    cp = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=8,
                            dtype=jnp.bfloat16, window_mode="pallas")
    c0.prepare(params["ent"])
    cp.prepare(params["ent"])
    hindex = geom.hindex(h * 8, w)
    mask = np.zeros((8, cfg.ngroup, h, w), bool)
    for b in range(8):
        mask[b, :, :, :int(hindex[b])] = True
    rng = np.random.default_rng(13)
    planes = rng.integers(0, 8, (1, 8, cfg.ngroup, h, w)).astype(np.int32)
    streams = cp.encode_planes(planes)
    dec = cp.decode_streams(streams)
    assert ((dec == planes) | ~mask[None]).all()

    teacher = jnp.asarray(planes.reshape(1, -1))

    def ranges(cd):
        words = jnp.zeros((cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((1, 8), jnp.int32),
                            jnp.zeros((1, 8), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    np.testing.assert_array_equal(ranges(c0), ranges(cp))


def test_fused_conv_matches_gather_cells(setup):
    """window_mode='fused' (window assembly + sheared conv in one Pallas
    kernel) must reproduce the gather-path frontier cells at every step,
    for the input-plane and hidden-layer widths, with and without group
    chunking. Both paths accumulate fp32, so agreement is to fp32
    reassociation noise (the summation ORDER differs: 45 explicit taps vs
    one XLA conv); decodability never rests on this -- fused streams carry
    FLAG2_FUSEDSTEP and decode on the same executable."""
    cfg, geom, params, codec0, mask = setup
    for chunks in (1, 2):
        cg = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                                dtype=jnp.float32, conv_chunks=chunks)
        cf = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                                dtype=jnp.float32, window_mode="fused",
                                conv_chunks=chunks)
        cg.prepare(params["ent"])
        cf.prepare(params["ent"])
        rng = np.random.default_rng(97)
        for li in (0, 1, 11):                      # plane, hidden, output
            layer = cf._weights[li]
            CC = cfg.ngroup if li == 0 else 3 * cfg.ngroup * cf.cpn
            # fused buffers carry burst margins; the margins are zero in a
            # real run (only core rows are ever written), the gather
            # codec's buffer is exactly the core rows, and columns beyond
            # each band's valid width are NEVER written (the burst audit's
            # provably-zero case relies on that invariant)
            core = rng.standard_normal(
                (B, 4, H, W, CC)).astype(np.float32)
            wl = np.asarray(geom.hindex(H * 4, W))
            for bb in range(4):
                core[:, bb, :, int(wl[bb]):] = 0.0
            core = jnp.asarray(core.reshape(B, cf.S, CC))
            buf_f = jnp.zeros((B, cf.Sbuf, CC), jnp.float32)
            buf_f = buf_f.at[:, cf._row_off:cf._row_off + cf.S].set(core)
            buf_g = core
            for z in (0, cf.nsteps // 2, cf.nsteps - 1):
                want = np.asarray(cg._frontier_conv(buf_g, jnp.int32(z),
                                                    layer))
                got = np.asarray(cf._fused_conv(buf_f, jnp.int32(z), layer))
                np.testing.assert_allclose(
                    got, want, rtol=2e-5, atol=2e-5,
                    err_msg=f"chunks={chunks} layer={li} step={z}")


@pytest.mark.quick
def test_roundtrip_fused(setup):
    """Full fused-mode roundtrip: bit-exact symbols, container records the
    FLAG2_FUSEDSTEP profile, plain decoders reject fused streams."""
    import os
    import tempfile

    from pseudocylindrical_convolution_tpu.codec import container
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.float32, window_mode="fused",
                               conv_chunks=2)
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=101)

    rng = np.random.default_rng(103)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    with tempfile.TemporaryDirectory() as td:
        fns = [os.path.join(td, f"s{i}.bin") for i in range(B)]
        codec.encode_files(planes, fns)
        hdr = container.read_stream(fns[0])
        assert hdr["flags2"] & container.FLAG2_FUSEDSTEP
        got = codec.decode_files(fns)
        assert ((got == planes) | ~mask[None]).all()
        plain = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                                   dtype=jnp.float32, conv_chunks=2)
        plain.prepare(params["ent"])
        with pytest.raises(ValueError, match="profile"):
            plain.decode_files(fns)


def test_roundtrip_fused_bf16(setup):
    """Fused mode under the default bf16 activation profile (what the chip
    A/B runs): bit-exact roundtrip is per-executable."""
    cfg, geom, params, codec0, mask = setup
    codec = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                               dtype=jnp.bfloat16, window_mode="fused",
                               conv_chunks=1)
    codec.prepare(params["ent"])
    _roundtrip(cfg, codec, mask, seed=107)


def test_fused_wide_geometry_roundtrip():
    """Fused window+conv at the scaling-shaped config (npart=8, 4x32 tiles,
    ragged hindex, bf16): bit-exact roundtrip -- de-risks the high-res
    (config 4) on-chip A/B, whose geometry differs from the flagship in
    exactly these axes (taller tiles, ragged band widths)."""
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=8)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(2), cfg)
    h, w = 4, 32
    codec = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=8,
                               dtype=jnp.bfloat16, window_mode="fused",
                               conv_chunks=2)
    codec.prepare(params["ent"])
    hindex = geom.hindex(h * 8, w)
    mask = np.zeros((8, cfg.ngroup, h, w), bool)
    for b in range(8):
        mask[b, :, :, :int(hindex[b])] = True
    rng = np.random.default_rng(17)
    planes = rng.integers(0, 8, (1, 8, cfg.ngroup, h, w)).astype(np.int32)
    streams = codec.encode_planes(planes)
    dec = codec.decode_streams(streams)
    assert ((dec == planes) | ~mask[None]).all()


def test_roundtrip_fusedu(setup):
    """Unrolled-taps fused variant ('fusedu'): bit-exact roundtrip, values
    equal to the fori-taps fused kernel (same op sequence), and the
    container distinguishes the profile (FLAG2_FUSEDUNROLL)."""
    from pseudocylindrical_convolution_tpu.codec import container
    cfg, geom, params, codec0, mask = setup
    cu = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                            dtype=jnp.float32, window_mode="fusedu",
                            conv_chunks=1)
    cu.prepare(params["ent"])
    _roundtrip(cfg, cu, mask, seed=109)
    assert cu.profile_flags2 & container.FLAG2_FUSEDUNROLL

    cf = ScanWavefrontCodec(cfg, geom, H, W, batch=B, lanes=L,
                            dtype=jnp.float32, window_mode="fused",
                            conv_chunks=1)
    cf.prepare(params["ent"])
    rng = np.random.default_rng(113)
    planes = rng.integers(0, 8, (B, 4, cfg.ngroup, H, W)).astype(np.int32)
    teacher = jnp.asarray(planes.reshape(B, -1))

    def ranges(cd):
        words = jnp.zeros((B * cd.NW,), jnp.uint32)
        _, packed = cd._run(words, jnp.zeros((B, L), jnp.int32),
                            jnp.zeros((B, L), jnp.uint32), teacher,
                            decode=False)
        return np.asarray(packed)

    np.testing.assert_array_equal(ranges(cu), ranges(cf))
