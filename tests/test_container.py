"""Bitstream container: header round-trip and loud mismatch failures."""

import numpy as np
import pytest

from pseudocylindrical_convolution_tpu.codec import container

pytestmark = pytest.mark.quick


def test_scan_header_roundtrip(tmp_path):
    fn = str(tmp_path / "s.bin")
    lane_nbytes = np.array([3, 0, 5], np.int64)
    payload = b"abcdefgh"
    n = container.write_stream(fn, container.MODE_SCAN, 16, 192, 4, 128,
                               payload, lanes=3, batch=2,
                               lane_nbytes=lane_nbytes,
                               flags=container.FLAG_BF16)
    hdr = container.read_stream(fn)
    assert hdr["mode"] == container.MODE_SCAN
    assert (hdr["npart"], hdr["valid_dim"], hdr["h"], hdr["w"]) == \
        (16, 192, 4, 128)
    assert hdr["lanes"] == 3 and hdr["batch"] == 2
    assert hdr["flags"] == container.FLAG_BF16
    np.testing.assert_array_equal(hdr["lane_nbytes"], lane_nbytes)
    assert hdr["payload"] == payload
    assert n == container._HLEN + 12 + len(payload)


def test_dense_header_roundtrip(tmp_path):
    fn = str(tmp_path / "d.bin")
    container.write_stream(fn, container.MODE_DENSE, 4, 8, 2, 16, b"xy")
    hdr = container.read_stream(fn)
    assert hdr["mode"] == container.MODE_DENSE
    assert hdr["lane_nbytes"] is None
    assert hdr["flags"] == 0
    assert hdr["payload"] == b"xy"
    container.check_stream(hdr, fn, container.MODE_DENSE, 4, 8, 2, 16)


def test_mismatches_fail_loudly(tmp_path):
    fn = str(tmp_path / "d.bin")
    container.write_stream(fn, container.MODE_DENSE, 4, 8, 2, 16, b"xy")
    hdr = container.read_stream(fn)
    with pytest.raises(ValueError, match="mismatch"):
        container.check_stream(hdr, fn, container.MODE_SCAN, 4, 8, 2, 16)
    with pytest.raises(ValueError, match="mismatch"):
        container.check_stream(hdr, fn, container.MODE_DENSE, 4, 56, 2, 16)
    bad = str(tmp_path / "bad.bin")
    with open(bad, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 20)
    with pytest.raises(ValueError, match="magic"):
        container.read_stream(bad)


def test_scan_profile_mismatch_rejected(tmp_path):
    """A stream from the bf16 executable must not silently decode on an
    fp32 decoder (and vice versa)."""
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        ScanWavefrontCodec)
    import jax
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)
    enc = ScanWavefrontCodec(cfg, geom, 2, 8, batch=1, lanes=4,
                             dtype=jnp.bfloat16)
    enc.prepare(params["ent"])
    planes = np.zeros((1, 4, cfg.ngroup, 2, 8), np.int32)
    fn = str(tmp_path / "p.bin")
    enc.encode_files(planes, [fn])
    dec = ScanWavefrontCodec(cfg, geom, 2, 8, batch=1, lanes=4,
                             dtype=jnp.float32)
    dec.prepare(params["ent"])
    with pytest.raises(ValueError, match="profile"):
        dec.decode_files([fn])


def test_scan_chunks_profile_mismatch_rejected(tmp_path):
    """conv_chunks / hoist are executable profile bits too: a stream from a
    chunked or hoisted program must be rejected by a plain decoder."""
    import jax
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        ScanWavefrontCodec)
    cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)
    planes = np.zeros((1, 4, cfg.ngroup, 2, 8), np.int32)
    enc = ScanWavefrontCodec(cfg, geom, 2, 8, batch=1, lanes=4,
                             conv_chunks=2)
    enc.prepare(params["ent"])
    fn = str(tmp_path / "c.bin")
    enc.encode_files(planes, [fn])
    assert container.read_stream(fn)["flags"] >> container.CHUNKS_SHIFT == 1
    dec = ScanWavefrontCodec(cfg, geom, 2, 8, batch=1, lanes=4)
    dec.prepare(params["ent"])
    with pytest.raises(ValueError, match="profile"):
        dec.decode_files([fn])
