"""Class-style codec API mirroring the reference's PseudoEncoder /
PseudoDecoder objects (pseudo_codec.py:162-213) for drop-in familiarity.

The functional modules (codec/pipeline.py, codec/wavefront_scan.py,
codec/incremental.py) are the primary interfaces; these wrappers bundle
config + params + geometry and dispatch on the codec mode. Encoding picks
the mode explicitly ("scan" is the default, matching the CLI); decoding is
self-describing -- the stream container header selects the decoder.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig
from pseudocylindrical_convolution_tpu.codec import container
from pseudocylindrical_convolution_tpu.codec.incremental import (
    incr_decode_images, incr_encode_images)
from pseudocylindrical_convolution_tpu.codec.pipeline import (
    decode_image, encode_images)
from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
    scan_decode_images, scan_encode_images)


class PseudoEncoder:
    """Image(s) -> bitstream file(s).

    mode: "scan" (single-program wavefront codec, bit-exact by shared
    executable), "dense" (one-shot parallel tables, fastest encode), or
    "incremental" (per-step einsum codec)."""

    def __init__(self, valid_dim: int, params, channels: int = 192,
                 code_channels: int = 192, npart: int = 16,
                 transform_dtype: str = "float32", mode: str = "scan",
                 batch: int = 1, lanes: int | None = None):
        self.cfg = CMPNetConfig(valid_dim=valid_dim, channels=channels,
                                code_channels=code_channels, npart=npart,
                                transform_dtype=transform_dtype)
        self.geom = self.cfg.geometry()
        self.params = params
        self.mode = mode
        self.batch, self.lanes = batch, lanes

    def __call__(self, x, code_name):
        """x: (1, 3, H, W) array or list of arrays; code_name: str or list.
        Returns the stream size(s) in bytes."""
        single = not isinstance(code_name, (list, tuple))
        xs = [x] if single else list(x)
        fns = [code_name] if single else list(code_name)
        xs = [jnp.asarray(v) for v in xs]
        if self.mode == "scan":
            sizes = scan_encode_images(self.params, xs, self.cfg, self.geom,
                                       fns, batch=self.batch,
                                       lanes=self.lanes)
        elif self.mode == "incremental":
            sizes = incr_encode_images(self.params, xs, self.cfg, self.geom,
                                       fns)
        else:
            sizes = encode_images(self.params, xs, self.cfg, self.geom, fns)
        return sizes[0] if single else sizes


class PseudoDecoder:
    """Bitstream file(s) -> image(s); the container header picks the mode."""

    def __init__(self, valid_dim: int, params, channels: int = 192,
                 code_channels: int = 192, npart: int = 16,
                 transform_dtype: str = "float32"):
        self.cfg = CMPNetConfig(valid_dim=valid_dim, channels=channels,
                                code_channels=code_channels, npart=npart,
                                transform_dtype=transform_dtype)
        self.geom = self.cfg.geometry()
        self.params = params

    def __call__(self, code_name, image_hw=(512, 1024)):
        single = not isinstance(code_name, (list, tuple))
        fns = [code_name] if single else list(code_name)
        modes = {container.read_stream(fn)["mode"] for fn in fns}
        if len(modes) != 1:
            raise ValueError(f"mixed stream modes in one decode: {modes}")
        mode = modes.pop()
        if mode == container.MODE_SCAN:
            rec = scan_decode_images(self.params, self.cfg, self.geom, fns,
                                     image_hw)
        elif mode == container.MODE_INCR:
            rec = incr_decode_images(self.params, self.cfg, self.geom, fns,
                                     image_hw)
        else:
            rec = decode_image(self.params, self.cfg, self.geom, fns,
                               image_hw)
        rec = np.asarray(rec)
        return rec[0:1] if single else rec
