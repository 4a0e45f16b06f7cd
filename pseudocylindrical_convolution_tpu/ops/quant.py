"""Learned non-uniform scalar quantizer (pseudo_quant / pseudo_dquant).

Behavioral reference: extension/pseudo_quant_cuda.cu and
extension/pseudo_dquant_cuda.cu.

Parameterization: ``weight`` is (C, bins); level values are
L[c,0] = w[c,0], L[c,j] = L[c,j-1] + exp(w[c,j]).

The custom VJP replicates the reference's three gradient paths exactly
(pseudo_quant_cuda.cu:196-298):
  * data grad    = straight-through copy of the dequantized output's grad,
                   plus top_alpha * (index output's grad) / beta where beta is
                   a local gap-derived slope, masked to the valid region;
  * weight grad  = sum of the quantization error (top - x) over positions
                   with q >= j, scaled by exp(w_j) for j > 0 -- note this is
                   independent of the upstream cotangent (a built-in
                   centroid-fitting update);
  * count "grad" = the negative usage histogram, which the training loop
                   applies with a plain SGD step (reference keeps ``count``
                   as a parameter with its own optimizer,
                   trainDDP_Full.py:139).

One deliberate deviation: both cotangent-independent paths (weight grad and
histogram) are normalized by the leading dim N (= batch * npart) instead of
the reference's raw sums. The reference's sums make gradients scale with the
local batch size, so DDP-averaged multi-GPU grads differ from single-GPU
grads on the concatenated batch by a factor of world_size. Normalizing makes
data-parallel pmean EXACTLY equal to the single-device gradient under any
sharding (tests/test_train_multichip.py, tests/test_multihost.py); the
constant rescale is absorbed by Adam's second-moment normalization (weight)
and by the count SGD learning rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pseudo_quant", "pseudo_dquant", "quant_init_weight",
           "quant_update_weight", "quant_levels"]


def quant_init_weight(channels: int, bins: int = 8) -> np.ndarray:
    """Initial weights (PCONV_operator/PseudoContextV2.py:245-249)."""
    ta = 1.0 / (bins + 1)
    w = np.full((channels, bins), np.log(ta), dtype=np.float32)
    w[:, 0] = ta
    return w


def quant_levels(weight):
    """(C, bins) raw weights -> (C, bins) level values (cumsum of exp)."""
    gaps = jnp.concatenate(
        [weight[:, :1], jnp.exp(weight[:, 1:])], axis=1)
    return jnp.cumsum(gaps, axis=1)


def _quantize(x, weight, mask):
    """Nearest-level quantization. x: (N, C, H, W); mask: (N?,1-broadcast)."""
    levels = quant_levels(weight)                      # (C, bins)
    mids = 0.5 * (levels[:, :-1] + levels[:, 1:])      # (C, bins-1)
    # q = number of midpoints <= x (ties -> upper bin, matching the strict
    # '< midpoint' test in pseudo_quant_cuda.cu:77-80)
    q = jnp.sum(x[:, :, :, :, None] >= mids[None, :, None, None, :],
                axis=-1).astype(jnp.int32)
    top = jnp.take_along_axis(
        levels[None, :, None, None, :], q[..., None], axis=-1)[..., 0]
    q = jnp.where(mask > 0, q, 0)
    top = jnp.where(mask > 0, top, 0.0)
    return top, q


def _neg_hist(q, mask, channels, bins, norm=None):
    onehot = jax.nn.one_hot(q, bins, dtype=jnp.float32)    # (N,C,H,W,bins)
    onehot = onehot * mask[..., None]
    # per-tile mean over N (see module docstring: DP == single-device).
    # `norm` overrides the divisor for band-sharded calls where the local
    # leading dim is npart/ndev but the contract is the GLOBAL tile count
    # (a later psum then reproduces the single-device histogram exactly).
    return -jnp.sum(onehot, axis=(0, 2, 3)) / (norm or q.shape[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pseudo_quant(x, weight, mask, top_alpha=0.0001, norm=None):
    """Returns (top, qidx_float, neg_hist).

    x: (N, C, H, W) tiled values with N = batch*npart ordering irrelevant as
    long as ``mask`` ((N,1,H,W) or broadcastable) marks the valid region.
    ``norm`` (static) overrides the 1/N normalization of the histogram and
    the centroid-fit weight grad with the GLOBAL tile count -- pass
    ``geom.npart`` from inside a band-sharded shard_map so the post-psum
    values match the single-device op.
    """
    top, q = _quantize(x, weight, mask)
    hist = _neg_hist(q, mask, weight.shape[0], weight.shape[1], norm)
    return top, q.astype(jnp.float32), hist


def _quant_fwd(x, weight, mask, top_alpha, norm):
    top, q = _quantize(x, weight, mask)
    hist = _neg_hist(q, mask, weight.shape[0], weight.shape[1], norm)
    return (top, q.astype(jnp.float32), hist), (x, weight, mask, top, q)


def _quant_bwd(top_alpha, norm, res, grads):
    x, weight, mask, top, q = res
    g_top, g_q, _ = grads
    bins = weight.shape[1]
    gaps = jnp.exp(weight)          # gaps[:,0] unused as a gap
    # --- weight grad: centroid-fit update, independent of cotangents ---
    err = (top - x) * mask          # (N,C,H,W)
    jidx = jnp.arange(bins)
    # contrib[c, j] = sum over positions with q >= j of err
    sel = (q[..., None] >= jidx[None, None, None, None, :]).astype(x.dtype)
    # per-tile mean over N (see module docstring: DP == single-device)
    wgrad = jnp.sum(err[..., None] * sel, axis=(0, 2, 3)) / (norm or x.shape[0])
    scale = jnp.concatenate(
        [jnp.ones_like(gaps[:, :1]), gaps[:, 1:]], axis=1)
    wgrad = wgrad * scale
    # --- data grad: STE + top_alpha-scaled slope path ---
    # beta per element (pseudo_quant_top_diff_kernel, :231-261)
    def gap_at(idx):
        return jnp.take_along_axis(gaps[None, :, None, None, :],
                                   idx[..., None], axis=-1)[..., 0]
    q_lo = jnp.clip(q, 1, bins - 1)
    q_hi = jnp.clip(q + 1, 1, bins - 1)
    g_cur = gap_at(q_lo)     # exp(w_q), valid for q>=1
    g_nxt = gap_at(q_hi)     # exp(w_{q+1}), valid for q<bins-1
    big = jnp.float32(10000.0)
    beta_lt = jnp.where(q < bins - 1, g_nxt, big)     # top < x
    beta_gt = jnp.where(q > 0, g_cur, big)            # top > x
    beta_eq = jnp.where(q == 0, g_nxt,
                        jnp.where(q < bins - 1, 0.5 * (g_cur + g_nxt), g_cur))
    beta = jnp.where(top < x, beta_lt, jnp.where(top > x, beta_gt, beta_eq))
    beta = jnp.maximum(beta, 0.001)
    dx = (g_top + top_alpha * g_q / beta) * mask
    return dx, wgrad, jnp.zeros_like(mask)


pseudo_quant.defvjp(_quant_fwd, _quant_bwd)


def pseudo_dquant(qidx, weight, mask):
    """Integer indices -> level values (pseudo_dquant_cuda.cu:23-47)."""
    levels = quant_levels(weight)
    q = qidx.astype(jnp.int32)
    out = jnp.take_along_axis(levels[None, :, None, None, :],
                              q[..., None], axis=-1)[..., 0]
    return out * mask


def quant_update_weight(weight, count, bins: int = 8):
    """Bin-merging maintenance step (pseudo_quant_check_weight, :96-116).

    Executed every ``check_iters`` training iterations. Returns the new
    weight; the caller also applies count <- count * weight_decay.
    """
    # j = largest index in [2, bins-1] with count[c, j] >= 1e-3, else 1.
    jr = jnp.arange(bins)
    used = (count >= 1e-3) & (jr[None, :] >= 2)
    j = jnp.where(jnp.any(used, axis=1),
                  (bins - 1) - jnp.argmax(used[:, ::-1], axis=1), 1)
    wj = jnp.take_along_axis(weight, j[:, None], axis=1)[:, 0]
    tmp = wj - jnp.log((bins - j).astype(weight.dtype))
    w = jnp.where(jr[None, :] >= j[:, None], tmp[:, None], weight)
    # level-0 unused: shift w0 up by one gap and split the next two gaps.
    unused0 = count[:, 0] < 1e-3
    w0 = w[:, 0] + jnp.exp(w[:, 1])
    t2 = jnp.log((jnp.exp(w[:, 1]) + jnp.exp(w[:, 2])) / 2)
    w = w.at[:, 0].set(jnp.where(unused0, w0, w[:, 0]))
    w = w.at[:, 1].set(jnp.where(unused0, t2, w[:, 1]))
    w = w.at[:, 2].set(jnp.where(unused0, t2, w[:, 2]))
    return w
