"""WS-PSNR vs an independent numpy oracle (Sun/Lu/Yu SPL'17 definition)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pseudocylindrical_convolution_tpu.ops.wspsnr import (
    erp_row_weights, ws_mse, ws_psnr)

pytestmark = pytest.mark.quick


def _oracle_ws_psnr(x, y, max_val=1.0):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    h, w = x.shape[-2], x.shape[-1]
    wgt = np.cos((np.arange(h) + 0.5 - h / 2.0) * np.pi / h)
    wgt = np.broadcast_to(wgt[:, None], x.shape)
    wmse = (wgt * (x - y) ** 2).sum() / wgt.sum()
    return 10 * np.log10(max_val ** 2 / wmse)


def test_ws_psnr_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 64, 128), np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape).astype(np.float32), 0, 1)
    got = float(ws_psnr(jnp.asarray(x), jnp.asarray(y)))
    want = _oracle_ws_psnr(x, y)
    assert abs(got - want) < 1e-3


def test_row_weights_are_cos_latitude():
    w = erp_row_weights(8)
    # symmetric, max at equator, strictly positive
    assert np.allclose(w, w[::-1])
    assert w.argmax() in (3, 4)
    assert (w > 0).all()
    assert abs(w[3] - np.cos(-0.5 * np.pi / 8)) < 1e-6


def test_ws_psnr_weights_equator_more_than_poles():
    # identical error energy placed at the pole vs the equator: the
    # equatorial error must cost more dB
    h, w = 64, 128
    x = np.zeros((1, 1, h, w), np.float32)
    pole = x.copy()
    pole[..., 0, :] = 0.1
    eq = x.copy()
    eq[..., h // 2, :] = 0.1
    p_pole = float(ws_psnr(jnp.asarray(x), jnp.asarray(pole)))
    p_eq = float(ws_psnr(jnp.asarray(x), jnp.asarray(eq)))
    assert p_pole > p_eq + 10.0  # pole rows are ~40x down-weighted


def test_identical_images_cap():
    x = jnp.ones((1, 3, 16, 32)) * 0.5
    assert float(ws_mse(x, x)) == 0.0
    assert float(ws_psnr(x, x)) == pytest.approx(120.0)  # 1e-12 floor
