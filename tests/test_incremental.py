"""Incremental wavefront codec: frontier computations must match the dense
causal network at every step's cells, and encode->decode must round-trip
bit-exactly (the mode is self-consistent: encoder replays the decoder's
step program teacher-forced)."""

import numpy as np
import jax
import jax.numpy as jnp

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.models.entropy import entropy_net_raw
from pseudocylindrical_convolution_tpu.codec.incremental import WavefrontCodec
from pseudocylindrical_convolution_tpu.codec.wavefront import (
    wavefront_schedule)

CFG = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
GEOM = CFG.geometry()
H, W = 2, 16


def _setup(seed=0):
    params = cmpnet_init(jax.random.PRNGKey(seed), CFG)
    wf = WavefrontCodec(CFG, GEOM, H, W)
    wf.prepare(params["ent"])
    rng = np.random.RandomState(seed)
    plane = rng.randint(0, 8, size=(GEOM.npart, CFG.ngroup, H, W)
                        ).astype(np.float32)
    # zero outside valid region
    hindex = GEOM.hindex(H * GEOM.npart, W)
    for g in range(GEOM.npart):
        plane[g, :, :, hindex[g]:] = 0
    return params, wf, plane


def test_wavefront_params_match_dense():
    """Teacher-forced incremental pass must produce the same GMM parameters
    (hence nearly identical CDF rows) as the dense evaluation."""
    params, wf, plane = _setup()
    syms, tables_async = wf._run(None, teacher_plane=plane)
    # dense reference tables
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        _table_program)
    dense_tb = np.asarray(_table_program(
        params["ent"],
        jnp.asarray(plane[None] - 3.5), CFG, GEOM))[0]
    order, counts, nsteps = wavefront_schedule(GEOM, H, W, CFG.ngroup)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    mism = 0
    total = 0
    for (z, tb) in tables_async:
        n = int(counts[z])
        o = offsets[z]
        rows = np.asarray(tb)[wf.grid_idx[o:o + n]].astype(np.int32)
        want = dense_tb[o:o + n, 1:8]
        total += rows.size
        mism += int((np.abs(rows - want) > 1).sum())
        # integer CDFs from two different programs may differ by 1 ulp at
        # rounding boundaries; anything more indicates a real bug
        np.testing.assert_allclose(rows, want, atol=1)
    assert total > 0
    # the overwhelming majority must match exactly
    exact = 1 - mism / total
    assert exact > 0.999, exact


def test_wavefront_roundtrip_bit_exact(tmp_path):
    params, wf, plane = _setup(seed=1)
    fn = str(tmp_path / "wf.bin")
    size = wf.encode(plane, fn)
    assert size > 0
    dec = wf.decode(fn)
    np.testing.assert_array_equal(dec, plane)
