import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.ops.pad import pseudo_pad
from pseudocylindrical_convolution_tpu.ops.fill import pseudo_fill
from pseudocylindrical_convolution_tpu.ops.slice import sphere_slice, sphere_uslice

# pad/slice reference-sim oracles: seconds per test, part of the quick tier
pytestmark = pytest.mark.quick
from pseudocylindrical_convolution_tpu.ops.dtow import dtow

from reference_sim import (pseudo_pad_ref, sphere_slice_ref, sphere_uslice_ref)

GEOM = Geometry(npart=16, opt=True, config_file="/nonexistent")
GEOM4 = Geometry(npart=4, opt=True, config_file="/nonexistent")


def _rand_tiles(geom, n, c, h, w, seed=0):
    """Random tiles, zero outside the valid region (model invariant)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n * geom.npart, c, h, w).astype(np.float32)
    hindex = geom.hindex(h * geom.npart, w)
    for g in range(geom.npart):
        x[g::geom.npart, :, :, hindex[g]:] = 0
    return x


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("h,w,pad", [(2, 64, 1), (2, 64, 2), (4, 128, 2), (1, 32, 1)])
def test_pad_matches_reference_sim(causal, h, w, pad):
    x = _rand_tiles(GEOM, 1, 3, h, w, seed=h * w + pad)
    got = np.asarray(pseudo_pad(jnp.asarray(x), GEOM, pad, causal=causal))
    hindex = GEOM.hindex(h * GEOM.npart, w)
    want = pseudo_pad_ref(x.reshape(GEOM.npart, 3, h, w), hindex, pad,
                          causal=causal)
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=1e-5,
                               atol=1e-5)


def test_pad_batch_and_channels():
    x = _rand_tiles(GEOM4, 2, 5, 3, 48, seed=7)
    got = np.asarray(pseudo_pad(jnp.asarray(x), GEOM4, 2))
    hindex = GEOM4.hindex(3 * 4, 48)
    for n in range(2):
        want = pseudo_pad_ref(x.reshape(2, 4, 5, 3, 48)[n], hindex, 2)
        np.testing.assert_allclose(got.reshape(2, 4, 5, 7, 52)[n], want,
                                   rtol=1e-5, atol=1e-5)


def test_pad_differentiable():
    x = _rand_tiles(GEOM4, 1, 2, 2, 16, seed=1)

    def f(t):
        return jnp.sum(pseudo_pad(t, GEOM4, 1) ** 2)

    g = jax.grad(f)(jnp.asarray(x))
    # numerical check on a few coordinates
    eps = 1e-3
    rng = np.random.RandomState(0)
    for _ in range(5):
        i = tuple(rng.randint(0, s) for s in x.shape)
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        num = (f(jnp.asarray(xp)) - f(jnp.asarray(xm))) / (2 * eps)
        np.testing.assert_allclose(g[i], num, rtol=2e-2, atol=2e-2)


def test_slice_matches_reference_sim():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 64, 128).astype(np.float32)
    got = np.asarray(sphere_slice(jnp.asarray(x), GEOM))
    hindex = GEOM.hindex(64, 128)
    want = sphere_slice_ref(x, hindex, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_uslice_matches_reference_sim():
    x = _rand_tiles(GEOM, 2, 3, 4, 128, seed=4)
    got = np.asarray(sphere_uslice(jnp.asarray(x), GEOM))
    hindex = GEOM.hindex(64, 128)
    want = sphere_uslice_ref(x, hindex, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_slice_uslice_roundtrip_smooth():
    # band-limited horizontal signal should round-trip closely
    w = 256
    cols = np.arange(w) / w
    sig = (np.sin(2 * np.pi * cols) + 0.5 * np.cos(4 * np.pi * cols)).astype(np.float32)
    x = np.broadcast_to(sig, (1, 1, 64, w)).copy()
    tiles = sphere_slice(jnp.asarray(x), GEOM)
    back = np.asarray(sphere_uslice(tiles, GEOM))
    err = np.abs(back - x).mean()
    assert err < 0.02, err


def test_fill():
    x = np.ones((16, 2, 4, 64), dtype=np.float32)
    y = np.asarray(pseudo_fill(jnp.asarray(x), GEOM))
    hindex = GEOM.hindex(64, 64)
    for g in range(16):
        assert y[g, :, :, : hindex[g]].all()
        assert (y[g, :, :, hindex[g]:] == 0).all()
    y2 = np.asarray(pseudo_fill(jnp.asarray(x), GEOM, fvalue=-1.0))
    for g in range(16):
        assert (y2[g, :, :, hindex[g]:] == -1).all()


def test_dtow_roundtrip_and_layout():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 3, 5).astype(np.float32)
    y = np.asarray(dtow(jnp.asarray(x), 2, True))
    assert y.shape == (2, 2, 6, 10)
    # channel c = pc*4 + rc -> (pc, h*2 + rc//2, w*2 + rc%2)
    for rc in range(4):
        np.testing.assert_array_equal(
            y[:, 1, (rc // 2)::2, (rc % 2)::2], x[:, 4 + rc])
    z = np.asarray(dtow(jnp.asarray(y), 2, False))
    np.testing.assert_array_equal(z, x)
