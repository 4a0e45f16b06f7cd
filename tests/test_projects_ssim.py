import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.ops.projects import (
    multi_project, _view_grids)
from pseudocylindrical_convolution_tpu.ops.ssim import ssim


def test_multi_project_constant_image():
    x = jnp.full((1, 3, 64, 128), 0.5)
    y = multi_project(x, 17, 25, 0.5)
    assert y.shape == (14, 3, 17, 25)
    np.testing.assert_allclose(np.asarray(y), 0.5, rtol=1e-5)


def test_multi_project_front_view_center():
    """The theta=0/phi=0 viewport center looks at the ERP center pixel."""
    H, W = 64, 128
    rng = np.random.RandomState(0)
    img = rng.rand(1, 1, H, W).astype(np.float32)
    y = np.asarray(multi_project(jnp.asarray(img), 17, 25, 0.5))
    grids = _view_grids(17, 25, 0.5, H, W)
    # view 1 is theta=0, phi=0; center of the viewport
    gx, gy = grids[1, 8, 12]
    assert abs(gx - (W - 1) / 2) < 1.0 and abs(gy - (H - 1) / 2) < 1.0
    # bilinear value at grid position
    x0, y0 = int(np.floor(gx)), int(np.floor(gy))
    tx, ty = gx - x0, gy - y0
    v = (img[0, 0, y0, x0] * (1 - tx) * (1 - ty)
         + img[0, 0, y0, (x0 + 1) % W] * tx * (1 - ty)
         + img[0, 0, min(y0 + 1, H - 1), x0] * (1 - tx) * ty
         + img[0, 0, min(y0 + 1, H - 1), (x0 + 1) % W] * tx * ty)
    np.testing.assert_allclose(y[1, 0, 8, 12], v, rtol=1e-4)


def test_multi_project_grad_hit_normalized():
    x = jnp.ones((1, 1, 32, 64))

    def f(t):
        return jnp.sum(multi_project(t, 9, 13, 0.5))

    g = np.asarray(jax.grad(f)(x))
    assert np.isfinite(g).all()
    # hit-normalized grads: each touched pixel's grad is ~sum(w)/(sum(w)+eps)
    touched = g[g > 0]
    assert touched.size > 0
    assert (touched <= 1.0 + 1e-5).all()
    # hit normalization: grad = sum(w)/(sum(w)+1e-6); ~1 except where the
    # bilinear weights are vanishingly small
    assert np.median(touched) > 0.99


def test_ssim_against_torch_reference_formula():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    a = rng.rand(2, 3, 32, 40).astype(np.float32)
    b = np.clip(a + rng.randn(2, 3, 32, 40).astype(np.float32) * 0.05, 0, 1)

    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))

    # direct torch implementation of the same formula (pytorch_ssim.py)
    gauss = torch.tensor(
        [np.exp(-((i - 5) ** 2) / (2 * 1.5 ** 2)) for i in range(11)],
        dtype=torch.float32)
    gauss = gauss / gauss.sum()
    win = (gauss[:, None] @ gauss[None, :]).expand(3, 1, 11, 11).contiguous()
    ta, tb = torch.tensor(a), torch.tensor(b)

    def flt(x):
        return F.conv2d(x, win, padding=5, groups=3)

    mu1, mu2 = flt(ta), flt(tb)
    s1 = flt(ta * ta) - mu1 ** 2
    s2 = flt(tb * tb) - mu2 ** 2
    s12 = flt(ta * tb) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    want = float(m.mean())
    # fp32 variance terms (E[x^2]-mu^2) amplify conv accumulation-order
    # differences between XLA and torch; formula parity, not bit parity.
    np.testing.assert_allclose(got, want, rtol=2e-3)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


def test_ssim_bounded_and_mixed_dtype():
    # the SSIM map is mathematically bounded by 1 (AM-GM + Cauchy-Schwarz on
    # the windowed moments); on TPU this only holds if the moment filters run
    # at full f32 precision (default conv precision multiplies in bf16 and
    # the variance cancellation blows the map past 1 in flat regions) --
    # ops/ssim.py pins precision=HIGHEST. Exercise flat regions, overshoot
    # values (unclipped decoder output), and bf16 inputs.
    rng = np.random.RandomState(3)
    a = rng.rand(4, 3, 64, 64).astype(np.float32)
    a[0] = 0.5                          # flat image
    b = a + rng.randn(*a.shape).astype(np.float32) * 0.02
    b[1] += 3.0 * rng.randn(3, 64, 64)  # overshoot
    for dt in (jnp.float32, jnp.bfloat16):
        v = float(ssim(jnp.asarray(a, dt), jnp.asarray(b, dt)))
        assert v <= 1.0 + 1e-5
        assert v >= -1.0 - 1e-5
