"""Spatial (latitude-band) sharding for single-image multi-chip inference.

The tiled representation (N*npart, C, h, W) carries the band axis in the
leading dimension, so sharding it over a ('band',) mesh partitions the
*image* across chips -- the TPU-native analogue of splitting the reference's
per-band CUDA work across SMs. Convolutions are batch-parallel over bands;
the cross-band couplings (pseudo_pad's neighbour-band rows, slice/uslice
row regrouping) are plain gathers, for which GSPMD inserts the necessary
halo collectives automatically. We annotate shardings and let XLA place
collectives on ICI (pjit style); a hand-tuned Pallas halo exchange is a
later optimization.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig


def make_band_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("band",))


def band_sharded_encode(params, cfg: CMPNetConfig, geom: Geometry,
                        mesh: Mesh):
    """Returns a jitted fn(params, x) -> latent symbols with the internal
    tiled tensors sharded over latitude bands.

    x: (1, 3, H, W) replicated; the sliced tiles (npart, C, h, W) are
    constrained to P('band') so all conv work splits across the mesh.
    """
    nband = mesh.devices.size

    def fn(params, x):
        tiles_sharding = NamedSharding(mesh, P("band"))

        # re-implement encode with a sharding constraint after the slice
        from pseudocylindrical_convolution_tpu.ops.slice import sphere_slice
        from pseudocylindrical_convolution_tpu.models.transform import (
            encoder_apply)
        from pseudocylindrical_convolution_tpu.models.cmpnet import _code_mask
        from pseudocylindrical_convolution_tpu.ops.quant import pseudo_quant
        from pseudocylindrical_convolution_tpu.ops.dtow import dtow

        tiles = sphere_slice(x, geom)
        tiles = jax.lax.with_sharding_constraint(tiles, tiles_sharding)
        code = encoder_apply(params["encoder"], tiles, geom, cfg._tdtype)
        code = jax.lax.with_sharding_constraint(code, tiles_sharding)
        qmask = _code_mask(geom, x.shape[0], code.shape[2], code.shape[3])
        _, code_i, _ = pseudo_quant(code, params["quant"]["weight"], qmask,
                                    cfg.top_alpha)
        return dtow(code_i[:, : cfg.valid_dim], 2, True)

    assert geom.npart % nband == 0, "npart must divide the band mesh"
    return jax.jit(fn)
