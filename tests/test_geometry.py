import numpy as np

from pseudocylindrical_convolution_tpu.geometry import (
    Geometry, band_widths, set_weight)

# canonical values produced by the reference implementation (validated by
# running PCONV_operator/base.py:set_weight standalone)
EXPECTED_W16_OPT = (15, 31, 54, 63, 63, 64, 64, 64, 64, 64, 64, 63, 63, 54, 31, 15)
EXPECTED_W16_COS = (7, 19, 31, 41, 50, 57, 62, 64, 64, 62, 57, 50, 41, 31, 19, 7)
EXPECTED_HINDEX_1024 = (240, 496, 864, 1008, 1008, 1024, 1024, 1024,
                        1024, 1024, 1024, 1008, 1008, 864, 496, 240)


def test_set_weight_opt():
    w = set_weight(16, True, config_file="/nonexistent")
    assert tuple(int(v) for v in w) == EXPECTED_W16_OPT


def test_set_weight_cos():
    w = set_weight(16, False)
    assert tuple(int(v) for v in w) == EXPECTED_W16_COS


def test_band_widths_scales():
    geom = Geometry(npart=16, opt=True, config_file="/nonexistent")
    assert tuple(geom.hindex(512, 1024)) == EXPECTED_HINDEX_1024
    for W in (512, 256, 128, 64):
        hw = geom.hindex(16, W)
        expect = [int(np.float32(v) / np.float32(64) * np.float32(W) + 0.5)
                  for v in geom.weight]
        assert list(hw) == expect
    # equator bands always span the full width
    assert geom.hindex(16, 128)[7] == 128


def test_valid_mask():
    geom = Geometry(npart=4, opt=True, config_file="/nonexistent")
    m = geom.valid_mask(2, 32)
    hindex = geom.hindex(8, 32)
    for g in range(4):
        assert m[g, 0, : hindex[g]].all()
        assert not m[g, 0, hindex[g]:].any()


def test_geometry_hashable_cached():
    g1 = Geometry(npart=16, opt=True, config_file="/nonexistent")
    g2 = Geometry(npart=16, opt=True, config_file="/nonexistent")
    assert hash(g1) == hash(g2)
    assert g1.hindex(512, 1024) is g2.hindex(512, 1024)

import pytest
pytestmark = pytest.mark.quick
