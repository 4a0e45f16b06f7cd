"""Group-autoregressive GMM entropy model (dense causal form).

Structural reference: model_zoo_v2.py:214-301 (EntropyConv /
EntropyResidualBlock / EntropySubNet / EntropyNet). The causal structure is
enforced by (a) the causal pseudo-pad (context_version=1) and (b) static v5/v6
weight masks multiplied onto the conv weights (mask_constrain_cuda.cu:63-88)
-- the reference mutates weights in place each step; multiplying at apply time
is the functional equivalent.

The same network evaluated densely produces, at every cell, exactly the
output the sequential wavefront decoder sees at that cell's step -- this is
the equivalence the reference relies on by loading one `ent.pt` into both
the train-time and codec-time graphs (pseudo_codec.py:242).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.layers import conv2d, prelu, prelu_init
from pseudocylindrical_convolution_tpu.ops.context_reshape import context_reshape
from pseudocylindrical_convolution_tpu.ops.fill import pseudo_fill
from pseudocylindrical_convolution_tpu.ops.gmm import entropy_gmm_loss
from pseudocylindrical_convolution_tpu.ops.masks import conv_mask
from pseudocylindrical_convolution_tpu.ops.pad import pseudo_pad


def _keys(key, n):
    return list(jax.random.split(key, n))


# ---------------- EntropyConv (model_zoo_v2.py:214-227) ----------------

def entropy_conv_init(key, ngroup, cin, cout, act=True):
    # MaskConv2 uses kaiming_normal weights and zero bias
    # (PCONV_operator/MaskConstrain.py:30-33)
    fan_in = ngroup * cin * 25
    w = jax.random.normal(key, (ngroup * cout, ngroup * cin, 5, 5),
                          jnp.float32) * jnp.sqrt(2.0 / fan_in)
    p = {"conv": {"weight": w,
                  "bias": jnp.zeros((ngroup * cout,), jnp.float32)}}
    if act:
        p["act"] = prelu_init(ngroup * cout)
    return p


def entropy_conv_apply(p, x, geom: Geometry, ngroup, cin, cout, hidden,
                       act=True):
    mask = conv_mask(6 if hidden else 5, ngroup * cout, ngroup * cin, 5, ngroup)
    tx = pseudo_pad(x, geom, 2, causal=True)
    tx = conv2d(p["conv"], tx, mask=jnp.asarray(mask))
    if act:
        tx = prelu(p["act"], tx)
    return pseudo_fill(tx, geom)


# ---------------- EntropySubNet (:241-269) ----------------

def entropy_subnet_init(key, ngroup, cpn=3, num_gaussian=3, net_type=1):
    k = _keys(key, 12)
    net = {"0": entropy_conv_init(k[0], ngroup, 1, cpn)}
    for r in range(5):  # residual blocks 1..5
        net[str(1 + r)] = {
            "conv1": entropy_conv_init(k[1 + 2 * r], ngroup, cpn, cpn),
            "conv2": entropy_conv_init(k[2 + 2 * r], ngroup, cpn, cpn)}
    net["6"] = entropy_conv_init(k[11], ngroup, cpn, num_gaussian, act=False)
    if net_type == 2:  # delta net: bias init 2 (model_zoo_v2.py:262)
        net["6"]["conv"]["bias"] = jnp.full_like(net["6"]["conv"]["bias"], 2.0)
    return {"net": net}


def entropy_subnet_raw(p, x, geom: Geometry, ngroup, cpn=3, num_gaussian=3):
    """Raw (pre-head-activation) subnet output: (N*npart, ngroup*ng, h, w)."""
    n = p["net"]
    y = entropy_conv_apply(n["0"], x, geom, ngroup, 1, cpn, hidden=False)
    for r in range(1, 6):
        t = entropy_conv_apply(n[str(r)]["conv1"], y, geom, ngroup, cpn, cpn,
                               hidden=True)
        t = entropy_conv_apply(n[str(r)]["conv2"], t, geom, ngroup, cpn, cpn,
                               hidden=True)
        y = y + t
    return entropy_conv_apply(n["6"], y, geom, ngroup, cpn, num_gaussian,
                              hidden=True, act=False)


# ---------------- EntropyNet (:272-301) ----------------

def entropy_net_init(key, ngroup, cpn=3, num_gaussian=3):
    k = _keys(key, 3)
    return {"weight_net": entropy_subnet_init(k[0], ngroup, cpn, num_gaussian, 0),
            "mean_net": entropy_subnet_init(k[1], ngroup, cpn, num_gaussian, 1),
            "delta_net": entropy_subnet_init(k[2], ngroup, cpn, num_gaussian, 2)}


def entropy_net_raw(p, x, geom: Geometry, ngroup, cpn=3, num_gaussian=3):
    """Raw GMM parameter maps for the codec path.

    x: biased symbols (N*npart, ngroup, h, w). Returns dict of
    (N*npart, ngroup*num_gaussian, h, w) raw weight/delta/mean maps.

    The three subnets are fused into single grouped convolutions
    (feature_group_count=3) -- one MXU-friendly conv call per layer instead
    of three, numerically identical to running the subnets separately (the
    reference batches the fused weights the same way at codec time,
    entropy_conv_cuda_v2.cu forward_batch).
    """
    from jax import lax

    subnets = ("weight_net", "delta_net", "mean_net")

    def fused_conv(layer_ps, t, cin, cout, hidden, act):
        mask = jnp.asarray(conv_mask(6 if hidden else 5, ngroup * cout,
                                     ngroup * cin, 5, ngroup))
        w = jnp.concatenate([lp["conv"]["weight"] * mask for lp in layer_ps])
        b = jnp.concatenate([lp["conv"]["bias"] for lp in layer_ps])
        t = pseudo_pad(t, geom, 2, causal=True)
        y = lax.conv_general_dilated(t, w, (1, 1), "VALID",
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"),
                                     feature_group_count=3)
        y = y + b[None, :, None, None]
        if act:
            a = jnp.concatenate([lp["act"]["weight"] for lp in layer_ps])
            y = jnp.where(y >= 0, y, a[None, :, None, None] * y)
        return pseudo_fill(y, geom)

    def layer(name):
        return [p[s]["net"][name] if not isinstance(name, tuple)
                else p[s]["net"][name[0]][name[1]] for s in subnets]

    x = pseudo_fill(x, geom)
    t = jnp.tile(x, (1, 3, 1, 1))
    y = fused_conv(layer("0"), t, 1, cpn, hidden=False, act=True)
    for r in range(1, 6):
        u = fused_conv(layer((str(r), "conv1")), y, cpn, cpn, True, True)
        u = fused_conv(layer((str(r), "conv2")), u, cpn, cpn, True, True)
        y = y + u
    out = fused_conv(layer("6"), y, cpn, num_gaussian, True, False)
    c = ngroup * num_gaussian
    return {"weight": out[:, :c], "delta": out[:, c: 2 * c],
            "mean": out[:, 2 * c:]}


def entropy_net_apply(p, x, geom: Geometry, ngroup, cpn=3, num_gaussian=3,
                      drop=False):
    """Train-time rate loss. Returns (loss_vec * mask, mask) flattened.

    x: biased symbols (N*npart, ngroup, h, w).
    """
    nb, _, h, w = x.shape
    mask = pseudo_fill(jnp.ones_like(x), geom).reshape(-1)
    x = pseudo_fill(x, geom)
    tx = jax.lax.stop_gradient(x) if drop else x
    raw = entropy_net_raw(p, tx, geom, ngroup, cpn, num_gaussian)
    weight = jax.nn.softmax(context_reshape(raw["weight"], ngroup), axis=1)
    mean = context_reshape(raw["mean"], ngroup)
    delta = jax.nn.relu(context_reshape(raw["delta"], ngroup)) + 1e-6
    label = tx.reshape(-1, 1)
    loss_vec = entropy_gmm_loss(weight, delta, mean, label)
    return loss_vec * mask, mask
