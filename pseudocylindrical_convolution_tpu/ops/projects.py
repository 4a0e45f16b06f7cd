"""MultiProject: render 14 fixed rectilinear viewports from an ERP image.

Behavioral reference: extension/projects_cuda.cu + projects.hpp (angles are
multiples of pi; Rodrigues rotations: yaw about z by theta, then pitch about
the rotated y axis by -phi) and PCONV_operator/MultiProject.py:39-40 for the
14 viewport directions. Sampling grids are static per (h_out, w_out, fov,
H, W), so the op is a precomputed bilinear gather; the backward matches the
reference wrapper's hit-count normalization
(PCONV_operator/MultiProject.py:23: grad / (count + 1e-6)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["multi_project", "VIEW_THETAS", "VIEW_PHIS"]

VIEW_THETAS = (-0.5, 0, 0.5, 1, -0.5, 0, 0.5, 1, -0.5, 0, 0.5, 1, 0, 0)
VIEW_PHIS = (0, 0, 0, 0, 0.25, 0.25, 0.25, 0.25,
             -0.25, -0.25, -0.25, -0.25, 0.5, -0.5)


def _rodrigues(vec):
    x, y, z = vec
    norm = float(np.sqrt(x * x + y * y + z * z))
    if norm == 0:
        return np.eye(3)
    tx, ty, tz = x / norm, y / norm, z / norm
    c, s = np.cos(norm), np.sin(norm)
    return np.array([
        [c + (1 - c) * tx * tx, (1 - c) * tx * ty - s * tz,
         (1 - c) * tx * tz + s * ty],
        [(1 - c) * ty * tx + s * tz, c + (1 - c) * ty * ty,
         (1 - c) * ty * tz - s * tx],
        [(1 - c) * tz * tx - s * ty, (1 - c) * tz * ty + s * tx,
         c + (1 - c) * tz * tz]])


@functools.lru_cache(maxsize=None)
def _view_grids(h_out: int, w_out: int, fov: float, H: int, W: int,
                thetas: tuple = VIEW_THETAS, phis: tuple = VIEW_PHIS):
    """(nview, h_out, w_out, 2) float32 ERP sample coords (x=col, y=row)."""
    pi = np.pi
    nview = len(thetas)
    hfov = fov * pi * h_out / w_out / 2
    wfov = fov * pi / 2
    c_x, c_y = (w_out - 1) / 2.0, (h_out - 1) / 2.0
    w_stride = 2 * np.sin(wfov) / np.sin(pi / 2 - wfov) / (w_out - 1)
    h_stride = 2 * np.sin(hfov) / np.sin(pi / 2 - hfov) / (h_out - 1)
    ww, hh = np.meshgrid(np.arange(w_out), np.arange(h_out))
    x = np.ones_like(ww, dtype=np.float64)
    y = (ww - c_x) * w_stride
    z = (hh - c_y) * h_stride
    r = np.sqrt(x * x + y * y + z * z)
    xyz = np.stack([x / r, y / r, -z / r], axis=-1)   # (h, w, 3)
    grids = np.zeros((nview, h_out, w_out, 2), dtype=np.float32)
    for v in range(nview):
        r1 = _rodrigues((0.0, 0.0, thetas[v] * pi))
        axis = r1[:, 1] * (-phis[v] * pi)             # rotated y axis * -phi
        r2 = _rodrigues(tuple(axis))
        rm = r2 @ r1
        p = xyz @ rm                                   # row-vector transform
        lat = np.arcsin(np.clip(p[..., 2], -1, 1))
        theta = np.arctan(p[..., 1] / p[..., 0])
        neg = p[..., 0] <= 0
        theta = np.where(neg & (p[..., 1] > 0), theta + pi,
                         np.where(neg & (p[..., 1] <= 0), theta - pi, theta))
        hx, hy = (W - 1) / 2.0, (H - 1) / 2.0
        grids[v, ..., 0] = theta / pi * hx + hx
        grids[v, ..., 1] = -2 * lat / pi * hy + hy
    grids.setflags(write=False)
    return grids


def _bilinear_taps(grids, H, W):
    """4-tap (row, col, weight) tables; col wraps, row clamps
    (projects_forward_kernel, projects_cuda.cu:180-198)."""
    gx, gy = grids[..., 0], grids[..., 1]
    tw = np.floor(gx).astype(np.int64)
    th = np.floor(gy).astype(np.int64)
    pw = (tw + 1) % W
    ph = np.minimum(th + 1, H - 1)
    tx, ty = gx - tw, gy - th
    taps = []
    for (r, c, w) in [(th, tw, (1 - tx) * (1 - ty)), (th, pw, tx * (1 - ty)),
                      (ph, tw, (1 - tx) * ty), (ph, pw, tx * ty)]:
        taps.append(((r * W + c).astype(np.int32), w.astype(np.float32)))
    return taps


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def multi_project(x, h_out: int = 171, w_out: int = 256, fov: float = 0.5,
                  thetas: tuple = VIEW_THETAS, phis: tuple = VIEW_PHIS):
    """(N, C, H, W) ERP -> (N*nview, C, h_out, w_out) viewports.

    Custom (thetas, phis) tuples give MultiProjectM semantics
    (PCONV_operator/MultiProject.py:25-33).
    """
    return _mp_fwd(x, h_out, w_out, fov, thetas, phis)[0]


def _mp_fwd(x, h_out, w_out, fov, thetas=VIEW_THETAS, phis=VIEW_PHIS):
    n, c, H, W = x.shape
    grids = _view_grids(h_out, w_out, fov, H, W, thetas, phis)
    taps = _bilinear_taps(grids, H, W)
    xf = x.reshape(n, c, H * W)
    out = 0.0
    for idx, w in taps:
        out = out + jnp.take(xf, idx, axis=-1) * w   # (n, c, nv, ho, wo)
    nv = grids.shape[0]
    out = out.transpose(0, 2, 1, 3, 4).reshape(n * nv, c, h_out, w_out)
    return out, (n, c, H, W)


def _mp_bwd(h_out, w_out, fov, thetas, phis, res, g):
    n, c, H, W = res
    grids = _view_grids(h_out, w_out, fov, H, W, thetas, phis)
    taps = _bilinear_taps(grids, H, W)
    nv = grids.shape[0]
    gg = g.reshape(n, nv, c, h_out, w_out).transpose(0, 2, 1, 3, 4)
    acc = jnp.zeros((n, c, H * W), g.dtype)
    cnt = jnp.zeros((H * W,), g.dtype)
    for idx, w in taps:
        idxf = jnp.asarray(idx.reshape(-1))
        acc = acc.at[:, :, idxf].add((gg * w).reshape(n, c, -1))
        cnt = cnt.at[idxf].add(jnp.asarray(w.reshape(-1)))
    dx = acc / (cnt + 1e-6)
    return (dx.reshape(n, c, H, W),)


multi_project.defvjp(_mp_fwd, _mp_bwd)
