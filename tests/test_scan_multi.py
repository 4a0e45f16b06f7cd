"""Multi-device scan-codec fan-out: D streams, one per mesh device, decoded
in one dispatch -- bit-equal to the single-device B=1 program."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.parallel.mesh import make_mesh
from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
    ScanWavefrontCodec, ShardedScanCodec)

CFG = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
GEOM = CFG.geometry()
H, W = 2, 16


def _planes(n, seed=0):
    rng = np.random.RandomState(seed)
    planes = rng.randint(0, 8, size=(n, GEOM.npart, CFG.ngroup, H, W)
                         ).astype(np.int32)
    hindex = GEOM.hindex(H * GEOM.npart, W)
    for g in range(GEOM.npart):
        planes[:, g, :, :, hindex[g]:] = 0
    return planes


@pytest.mark.parametrize("ndev", [4, 8])
def test_sharded_decode_bit_equal(ndev):
    """Streams encoded by the plain B=1 program decode bit-exactly on the
    sharded program (and vice versa): the shard body is the same per-stream
    computation, so CDF tables match across the two executables."""
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    codec = ScanWavefrontCodec(CFG, GEOM, H, W, batch=1, lanes=8,
                               dtype=jnp.float32)
    codec.prepare(params["ent"])
    mesh = make_mesh(ndev)
    sharded = ShardedScanCodec(codec, mesh)

    n = ndev - 1              # one idle device exercises padding
    planes = _planes(n)
    streams = []
    for i in range(n):        # plain single-stream encode
        streams.extend(codec.encode_planes(planes[i:i + 1]))

    got = sharded.decode_streams(streams)
    np.testing.assert_array_equal(got, planes)

    # sharded encode must produce byte-identical streams to the plain
    # encoder (same executable family => same CDF tables)
    streams2 = sharded.encode_planes(planes)
    for (p1, n1), (p2, n2) in zip(streams, streams2):
        assert p1 == p2
        np.testing.assert_array_equal(n1, n2)

    # and the plain decoder reads the sharded encoder's streams
    got2 = codec.decode_streams([streams2[0]])
    np.testing.assert_array_equal(got2[0], planes[0])
