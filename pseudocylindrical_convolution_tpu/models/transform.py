"""Analysis/synthesis transforms: EncoderV2 / DecoderV2 and their blocks.

Structural reference: model_zoo_v2.py:36-211. Every block sandwiches stock
VALID convs between pseudo_pad and pseudo_fill; GDN/IGDN follow the
reference's ResidualBlockDown/Up placement. Param dict keys mirror the torch
module names for 1:1 checkpoint conversion.
"""

from __future__ import annotations

import jax

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.layers import (
    conv2d, conv_init, prelu, prelu_init, sigmoid)
from pseudocylindrical_convolution_tpu.ops.bandctx import as_band_ctx
from pseudocylindrical_convolution_tpu.ops.dtow import dtow
from pseudocylindrical_convolution_tpu.ops.gdn import gdn_init


def _keys(key, n):
    return list(jax.random.split(key, n))


# ---------------- ResidualBlock (model_zoo_v2.py:36-53) ----------------

def residual_block_init(key, ch):
    k = _keys(key, 3)
    return {"conv1": conv_init(k[0], ch, ch // 2, 1),
            "relu1": prelu_init(ch // 2),
            "conv2": conv_init(k[1], ch // 2, ch // 2, 3),
            "relu2": prelu_init(ch // 2),
            "conv3": conv_init(k[2], ch // 2, ch, 1)}


def residual_block_apply(p, x, geom, dtype=None):
    ctx = as_band_ctx(geom)
    tx = ctx.pad(x, 1)
    y = prelu(p["relu1"], conv2d(p["conv1"], tx, dtype=dtype))
    y = prelu(p["relu2"], conv2d(p["conv2"], y, dtype=dtype))
    y = conv2d(p["conv3"], y, dtype=dtype)
    return ctx.fill(x + y)


# ---------------- AttentionBlock (:55-76) ----------------

def attention_block_init(key, ch):
    k = _keys(key, 7)
    return {"trunk": {str(i): residual_block_init(k[i], ch) for i in range(3)},
            "attention": {
                **{str(i): residual_block_init(k[3 + i], ch) for i in range(3)},
                "3": conv_init(k[6], ch, ch, 1)}}


def attention_block_apply(p, x, geom, dtype=None):
    ctx = as_band_ctx(geom)
    t = x
    for i in range(3):
        t = residual_block_apply(p["trunk"][str(i)], t, geom, dtype)
    a = x
    for i in range(3):
        a = residual_block_apply(p["attention"][str(i)], a, geom, dtype)
    a = sigmoid(conv2d(p["attention"]["3"], a, dtype=dtype))
    return ctx.fill(x + t * a)


# ---------------- ResidualBlockV2 (:78-93) ----------------

def residual_block_v2_init(key, ch):
    k = _keys(key, 2)
    return {"conv1": conv_init(k[0], ch, ch, 3), "relu1": prelu_init(ch),
            "conv2": conv_init(k[1], ch, ch, 3), "relu2": prelu_init(ch)}


def residual_block_v2_apply(p, x, geom, dtype=None):
    ctx = as_band_ctx(geom)
    tx = ctx.pad(x, 2)
    y = prelu(p["relu1"], conv2d(p["conv1"], tx, dtype=dtype))
    y = prelu(p["relu2"], conv2d(p["conv2"], y, dtype=dtype))
    return ctx.fill(x + y)


# ---------------- ResidualBlockDown (:95-114) ----------------

def residual_block_down_init(key, ch, cin):
    k = _keys(key, 3)
    return {"conv1": conv_init(k[0], cin, ch, 3), "relu1": prelu_init(ch),
            "conv2": conv_init(k[1], ch, ch, 3), "relu2": gdn_init(ch),
            "short_cut": conv_init(k[2], cin, ch, 1)}


def residual_block_down_apply(p, x, geom, dtype=None):
    ctx = as_band_ctx(geom)
    t = conv2d(p["short_cut"], x, stride=2, dtype=dtype)
    y = ctx.pad(x, 1)
    y = prelu(p["relu1"], conv2d(p["conv1"], y, stride=2, dtype=dtype))
    y = ctx.pad(y, 1)
    y = ctx.gdn(p["relu2"], conv2d(p["conv2"], y, dtype=dtype), dtype=dtype)
    return ctx.fill(t + y)


# ---------------- SphereConv2 (:116-126) ----------------

def sphere_conv2_init(key, cin, cout):
    return {"conv": conv_init(key, cin, cout, 3)}


def sphere_conv2_apply(p, x, geom, dtype=None):
    ctx = as_band_ctx(geom)
    x = ctx.pad(x, 1)
    x = conv2d(p["conv"], x, stride=2, dtype=dtype)
    return ctx.fill(x)


# ---------------- EncoderV2 (:129-151) ----------------

def encoder_init(key, channels=192, code_channels=192):
    k = _keys(key, 10)
    return {"net": {
        "0": residual_block_down_init(k[0], channels, 3),
        "1": residual_block_v2_init(k[1], channels),
        "2": residual_block_down_init(k[2], channels, channels),
        "3": attention_block_init(k[3], channels),
        "4": residual_block_v2_init(k[4], channels),
        "5": residual_block_down_init(k[5], channels, channels),
        "6": residual_block_v2_init(k[6], channels),
        "7": sphere_conv2_init(k[7], channels, channels),
        "8": attention_block_init(k[8], channels),
        "9": conv_init(k[9], channels, code_channels, 1),
    }}


def encoder_apply(p, x, geom, dtype=None):
    ctx = as_band_ctx(geom)
    n = p["net"]
    x = residual_block_down_apply(n["0"], x, geom, dtype)
    x = residual_block_v2_apply(n["1"], x, geom, dtype)
    x = residual_block_down_apply(n["2"], x, geom, dtype)
    x = attention_block_apply(n["3"], x, geom, dtype)
    x = residual_block_v2_apply(n["4"], x, geom, dtype)
    x = residual_block_down_apply(n["5"], x, geom, dtype)
    x = residual_block_v2_apply(n["6"], x, geom, dtype)
    x = sphere_conv2_apply(n["7"], x, geom, dtype)
    x = attention_block_apply(n["8"], x, geom, dtype)
    x = conv2d(n["9"], x, dtype=dtype)
    return ctx.fill(sigmoid(x))


# ---------------- ResidualBlockUp (:153-175) ----------------

def residual_block_up_init(key, ch):
    k = _keys(key, 3)
    return {"conv1": conv_init(k[0], ch, ch * 4, 3), "relu1": prelu_init(ch * 4),
            "conv2": conv_init(k[1], ch, ch, 3), "relu2": gdn_init(ch),
            "short_cut": conv_init(k[2], ch, ch * 4, 1)}


def residual_block_up_apply(p, x, geom, dtype=None):
    ctx = as_band_ctx(geom)
    br1 = ctx.pad(x, 1)
    br1 = prelu(p["relu1"], conv2d(p["conv1"], br1, dtype=dtype))
    br1 = dtow(br1, 2, True)
    br1 = ctx.pad(br1, 1)
    br1 = ctx.gdn(p["relu2"], conv2d(p["conv2"], br1, dtype=dtype),
                  inverse=True, dtype=dtype)
    br2 = dtow(conv2d(p["short_cut"], x, dtype=dtype), 2, True)
    return ctx.fill(br1 + br2)


# ---------------- DecoderV2 (:189-211) ----------------

def decoder_init(key, channels=192, code_channels=192):
    k = _keys(key, 11)
    return {"net": {
        "0": {"conv": conv_init(k[0], code_channels, channels, 1)},
        "1": attention_block_init(k[1], channels),
        "2": residual_block_v2_init(k[2], channels),
        "3": residual_block_up_init(k[3], channels),
        "4": residual_block_v2_init(k[4], channels),
        "5": residual_block_up_init(k[5], channels),
        "6": attention_block_init(k[6], channels),
        "7": residual_block_v2_init(k[7], channels),
        "8": residual_block_up_init(k[8], channels),
        "9": residual_block_v2_init(k[9], channels),
        "11": conv_init(k[10], channels, 12, 3),
    }}


def decoder_apply(p, x, geom, dtype=None):
    ctx = as_band_ctx(geom)
    n = p["net"]
    x = ctx.fill(conv2d(n["0"]["conv"], x, dtype=dtype))
    x = attention_block_apply(n["1"], x, geom, dtype)
    x = residual_block_v2_apply(n["2"], x, geom, dtype)
    x = residual_block_up_apply(n["3"], x, geom, dtype)
    x = residual_block_v2_apply(n["4"], x, geom, dtype)
    x = residual_block_up_apply(n["5"], x, geom, dtype)
    x = attention_block_apply(n["6"], x, geom, dtype)
    x = residual_block_v2_apply(n["7"], x, geom, dtype)
    x = residual_block_up_apply(n["8"], x, geom, dtype)
    x = residual_block_v2_apply(n["9"], x, geom, dtype)
    x = ctx.pad(x, 1)
    x = conv2d(n["11"], x, dtype=dtype)
    return dtow(x, 2, True)
