"""Integer CDF tables for the arithmetic coder, from raw GMM parameters.

Behavioral reference: extension/entropy_gmm_table_cuda.cu:28-133. Includes
the in-table softmax over mixture weights, the delta floor, integer rounding
against total=65536, and the sequential monotonicity repair
(entropy_gmm_table_check_kernel:82-105) replicated bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gmm_cdf_table"]

_S2 = 0.7071067811865476


def gmm_cdf_table(weight_raw, delta_raw, mean, nstep: int = 8,
                  bias: float = 3.5, total: int = 65536, beta: float = 1e-6):
    """(n, ng) raw params -> (n, nstep+1) int32 CDF rows.

    weight_raw is softmaxed here; delta_raw is floored at ``beta``
    (negative -> beta, else +beta) exactly as the reference does.
    """
    w = jax.nn.softmax(weight_raw, axis=-1)
    d = jnp.where(delta_raw < 0, beta, delta_raw + beta)
    # interior breakpoints: v_j = j - 1 - bias + 0.5 for j = 1..nstep-1
    j = jnp.arange(1, nstep, dtype=weight_raw.dtype)
    v = j - 1.0 - bias + 0.5                                   # (nstep-1,)
    z = (v[None, :, None] - mean[:, None, :]) / d[:, None, :]  # (n, J, ng)
    ps = jnp.sum(w[:, None, :] * (0.5 + 0.5 * jax.lax.erf(_S2 * z)), axis=-1)
    mid = (total * ps + 0.5).astype(jnp.int32)
    n = weight_raw.shape[0]
    table = jnp.concatenate(
        [jnp.zeros((n, 1), jnp.int32), mid,
         jnp.full((n, 1), total, jnp.int32)], axis=1)
    return _monotonic_repair(table, nstep)


def _monotonic_repair(table, nstep: int):
    """Sequential repair: bump non-increasing entries, re-deduct the total
    bump from the widest bin onward (entropy_gmm_table_check_kernel)."""
    t = [table[:, i] for i in range(nstep + 1)]
    bias = jnp.zeros_like(t[0])
    mval = jnp.zeros_like(t[0])
    midx = jnp.zeros_like(t[0])
    for i in range(nstep):
        bias = bias + (t[i + 1] <= t[i]).astype(jnp.int32)
        t[i + 1] = t[i + 1] + bias
        width = t[i + 1] - t[i]
        upd = width > mval
        mval = jnp.where(upd, width, mval)
        midx = jnp.where(upd, i, midx)
    has = bias > 0
    for i in range(nstep):
        t[i + 1] = jnp.where(has & (i >= midx), t[i + 1] - bias, t[i + 1])
    return jnp.stack(t, axis=1)
