"""CMPNetV2MF: the full end-to-end train graph, plus partial graphs.

Structural reference: model_zoo_v2.py:304-381.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.entropy import (
    entropy_net_apply, entropy_net_init)
from pseudocylindrical_convolution_tpu.models.transform import (
    decoder_apply, decoder_init, encoder_apply, encoder_init)
from pseudocylindrical_convolution_tpu.ops.clip import clip_data
from pseudocylindrical_convolution_tpu.ops.dtow import dtow
from pseudocylindrical_convolution_tpu.ops.fill import valid_mask
from pseudocylindrical_convolution_tpu.ops.quant import (
    pseudo_quant, quant_init_weight)
from pseudocylindrical_convolution_tpu.ops.slice import sphere_slice, sphere_uslice


@dataclasses.dataclass(frozen=True)
class CMPNetConfig:
    valid_dim: int = 192
    channels: int = 192
    code_channels: int = 192
    npart: int = 16
    quant_levels: int = 8
    opt: bool = True
    init: bool = False          # freeze E/D grads while initializing entropy
    top_alpha: float = 1e-4     # mse: 1e-4, ssim: 1e-2 (model_zoo_v2.py:314)
    # MXU dtype for the analysis/synthesis convs ("float32" or "bfloat16");
    # the entropy network always runs fp32 (CDF bit-exactness contract).
    transform_dtype: str = "float32"

    @property
    def _tdtype(self):
        import jax.numpy as _jnp
        return None if self.transform_dtype == "float32" else _jnp.bfloat16

    @property
    def ngroup(self):
        return self.valid_dim // 4

    @property
    def mean_val(self):
        return (self.quant_levels - 1) / 2.0

    def geometry(self, config_file: str = "./config/param.txt") -> Geometry:
        return Geometry(npart=self.npart, opt=self.opt,
                        config_file=config_file)


def cmpnet_init(key, cfg: CMPNetConfig):
    ke, kd, kn = jax.random.split(key, 3)
    return {
        "encoder": encoder_init(ke, cfg.channels, cfg.code_channels),
        "decoder": decoder_init(kd, cfg.channels, cfg.code_channels),
        "quant": {"weight": jnp.asarray(
            quant_init_weight(cfg.code_channels, cfg.quant_levels))},
        "ent": entropy_net_init(kn, cfg.ngroup),
    }


def _code_mask(geom: Geometry, n, h, w):
    m = jnp.asarray(valid_mask(geom, h, w))  # (npart, h, w)
    return jnp.tile(m[:, None], (n, 1, 1, 1))  # (n*npart, 1, h, w)


def cmpnet_apply(params, x, cfg: CMPNetConfig, geom: Geometry):
    """Full train-time forward (model_zoo_v2.py:322-334).

    x: (N, 3, H, W) in [0,1]. Returns (reconstruction, ent_vec, mask,
    quant_hist) where quant_hist is the negative usage histogram used to
    update the quantizer's ``count`` state.
    """
    n = x.shape[0]
    tiles = sphere_slice(x, geom)
    code = encoder_apply(params["encoder"], tiles, geom, cfg._tdtype)
    qmask = _code_mask(geom, n, code.shape[2], code.shape[3])
    code_f, code_i, hist = pseudo_quant(code, params["quant"]["weight"], qmask,
                                        cfg.top_alpha)
    # channel stub mask to valid_dim (StubMask, model_zoo_v2.py:315,326-327)
    vm = (jnp.arange(cfg.code_channels) < cfg.valid_dim
          ).astype(code_f.dtype)[None, :, None, None]
    tx = decoder_apply(params["decoder"], code_f * vm, geom, cfg._tdtype)
    tx = sphere_uslice(tx, geom)
    # entropy branch: Extract(valid_dim) -> Dtow d2w -> -mean -> EntropyNet
    code_v = code_i[:, : cfg.valid_dim]
    hcode = dtow(code_v, 2, True)
    qy = hcode - cfg.mean_val
    ent_vec, mask = entropy_net_apply(params["ent"], qy, geom, cfg.ngroup,
                                      drop=cfg.init)
    return clip_data(tx), ent_vec, mask, hist


def cmpnet_encode_latents(params, x, cfg: CMPNetConfig, geom: Geometry):
    """Image -> integer latent symbols (CMPNetV2MFExtractor, :336-354).

    Returns hcode_i: (N*npart, ngroup, 4*h, 2*w) integer symbols as float.
    """
    n = x.shape[0]
    tiles = sphere_slice(x, geom)
    code = encoder_apply(params["encoder"], tiles, geom, cfg._tdtype)
    qmask = _code_mask(geom, n, code.shape[2], code.shape[3])
    _, code_i, _ = pseudo_quant(code, params["quant"]["weight"], qmask,
                                cfg.top_alpha)
    return dtow(code_i[:, : cfg.valid_dim], 2, True)


def cmpnet_decode_latents(params, hcode_i, cfg: CMPNetConfig, geom: Geometry):
    """Integer latent symbols -> image (CMPNetV2Decoder + dquant path,
    pseudo_codec.py:203-213)."""
    from pseudocylindrical_convolution_tpu.ops.quant import pseudo_dquant
    code_i = dtow(hcode_i, 2, False)
    n = code_i.shape[0] // cfg.npart
    qmask = _code_mask(geom, n, code_i.shape[2], code_i.shape[3])
    code_ext = pseudo_dquant(code_i,
                             params["quant"]["weight"][: cfg.valid_dim], qmask)
    pad_ch = cfg.code_channels - cfg.valid_dim
    code_f = jnp.pad(code_ext, ((0, 0), (0, pad_ch), (0, 0), (0, 0)))
    tx = decoder_apply(params["decoder"], code_f, geom, cfg._tdtype)
    tx = sphere_uslice(tx, geom)
    return clip_data(tx)
