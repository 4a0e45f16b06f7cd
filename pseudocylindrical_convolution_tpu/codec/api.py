"""Class-style codec API mirroring the reference's PseudoEncoder /
PseudoDecoder objects (pseudo_codec.py:162-213) for drop-in familiarity.

The functional pipeline (codec/pipeline.py) is the primary interface; these
wrappers bundle config + params + geometry.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig
from pseudocylindrical_convolution_tpu.codec.pipeline import (
    decode_image, encode_image, encode_images)


class PseudoEncoder:
    """Image(s) -> bitstream file(s)."""

    def __init__(self, valid_dim: int, params, channels: int = 192,
                 code_channels: int = 192, npart: int = 16,
                 transform_dtype: str = "float32"):
        self.cfg = CMPNetConfig(valid_dim=valid_dim, channels=channels,
                                code_channels=code_channels, npart=npart,
                                transform_dtype=transform_dtype)
        self.geom = self.cfg.geometry()
        self.params = params

    def __call__(self, x, code_name):
        """x: (1, 3, H, W) array or list of arrays; code_name: str or list."""
        if isinstance(code_name, (list, tuple)):
            return encode_images(self.params, [jnp.asarray(v) for v in x],
                                 self.cfg, self.geom, list(code_name))
        return encode_image(self.params, jnp.asarray(x), self.cfg, self.geom,
                            code_name)


class PseudoDecoder:
    """Bitstream file(s) -> image(s)."""

    def __init__(self, valid_dim: int, params, channels: int = 192,
                 code_channels: int = 192, npart: int = 16,
                 transform_dtype: str = "float32"):
        self.cfg = CMPNetConfig(valid_dim=valid_dim, channels=channels,
                                code_channels=code_channels, npart=npart,
                                transform_dtype=transform_dtype)
        self.geom = self.cfg.geometry()
        self.params = params

    def __call__(self, code_name, image_hw=(512, 1024)):
        rec = decode_image(self.params, self.cfg, self.geom, code_name,
                           image_hw)
        return np.asarray(rec)
