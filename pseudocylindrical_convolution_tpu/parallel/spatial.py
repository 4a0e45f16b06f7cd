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


def band_sharded_encode_halo(params, cfg: CMPNetConfig, geom: Geometry,
                             mesh: Mesh):
    """Hand-tuned band-parallel encode: shard_map + ppermute halo exchange.

    Unlike ``band_sharded_encode`` (GSPMD auto-collectives around global
    gathers), every pseudo_pad here exchanges exactly ``pad`` boundary rows
    with each ring neighbour over ICI (ops/bandctx.LocalBands) and all
    gathers stay device-local. Returns a jitted fn(params, x) -> latent
    symbols identical to the single-device ``cmpnet_encode_latents``.
    """
    from jax import shard_map

    from pseudocylindrical_convolution_tpu.models.cmpnet import _code_mask
    from pseudocylindrical_convolution_tpu.models.transform import (
        encoder_apply)
    from pseudocylindrical_convolution_tpu.ops.bandctx import LocalBands
    from pseudocylindrical_convolution_tpu.ops.dtow import dtow
    from pseudocylindrical_convolution_tpu.ops.quant import pseudo_quant
    from pseudocylindrical_convolution_tpu.ops.slice import sphere_slice

    nd = mesh.devices.size
    assert geom.npart % nd == 0, "npart must divide the band mesh"
    ctx = LocalBands(geom, nd, axis_name="band")

    def local(params, tiles_l, qmask_l):
        code = encoder_apply(params["encoder"], tiles_l, ctx, cfg._tdtype)
        _, code_i, _ = pseudo_quant(code, params["quant"]["weight"], qmask_l,
                                    cfg.top_alpha)
        return dtow(code_i[:, : cfg.valid_dim], 2, True)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("band"), P("band")),
        out_specs=P("band"), check_vma=False)

    def fn(params, x):
        assert x.shape[0] == 1, "spatial parallelism is single-image"
        tiles = sphere_slice(x, geom)
        h_code = tiles.shape[2] // 16
        w_code = tiles.shape[3] // 16
        qmask = _code_mask(geom, 1, h_code, w_code)
        return sharded(params, tiles, qmask)

    return jax.jit(fn)


def band_sharded_decode_halo(params, cfg: CMPNetConfig, geom: Geometry,
                             mesh: Mesh):
    """Band-parallel latents -> image decode with explicit halo exchange.

    The synthesis transform runs device-local over each band block (pads
    exchange boundary rows via ppermute); tiles are all-gathered once at the
    end for the band-crossing sphere_uslice + clip. Output matches
    ``cmpnet_decode_latents`` exactly.
    """
    import jax.numpy as jnp
    from jax import shard_map

    from pseudocylindrical_convolution_tpu.models.cmpnet import _code_mask
    from pseudocylindrical_convolution_tpu.models.transform import (
        decoder_apply)
    from pseudocylindrical_convolution_tpu.ops.bandctx import LocalBands
    from pseudocylindrical_convolution_tpu.ops.clip import clip_data
    from pseudocylindrical_convolution_tpu.ops.dtow import dtow
    from pseudocylindrical_convolution_tpu.ops.quant import pseudo_dquant
    from pseudocylindrical_convolution_tpu.ops.slice import sphere_uslice

    nd = mesh.devices.size
    assert geom.npart % nd == 0, "npart must divide the band mesh"
    ctx = LocalBands(geom, nd, axis_name="band")

    def local(params, hcode_l, qmask_l):
        code_i = dtow(hcode_l, 2, False)
        code_ext = pseudo_dquant(
            code_i, params["quant"]["weight"][: cfg.valid_dim], qmask_l)
        pad_ch = cfg.code_channels - cfg.valid_dim
        code_f = jnp.pad(code_ext, ((0, 0), (0, pad_ch), (0, 0), (0, 0)))
        return decoder_apply(params["decoder"], code_f, ctx, cfg._tdtype)

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("band"), P("band")),
        out_specs=P("band"), check_vma=False)

    def fn(params, hcode_i):
        assert hcode_i.shape[0] == geom.npart, \
            "spatial parallelism is single-image"
        h2, w2 = hcode_i.shape[2] // 2, hcode_i.shape[3] // 2
        qmask = _code_mask(geom, 1, h2, w2)
        tx = sharded(params, hcode_i, qmask)
        return clip_data(sphere_uslice(tx, geom))

    return jax.jit(fn)


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


def band_sharded_loss_grads(cfg: CMPNetConfig, geom: Geometry, lw,
                            mesh: Mesh):
    """Band-parallel TRAINING: value_and_grad of the full reference loss
    with the analysis/synthesis transforms sharded over latitude bands.

    The reference has no tensor/spatial parallelism for training at all
    (DDP only, trainDDP_Full.py:97-159); this is the TPU-native extra axis
    that makes single-image high-resolution training fit: the encoder and
    decoder conv stacks (all of the FLOPs and activation memory) run
    device-local over npart/ndev bands with pseudo_pad exchanging exactly
    ``pad`` boundary rows per call over the ICI ring
    (ops/bandctx.LocalBands), while the cheap band-crossing tail -- 
    sphere_uslice, ClipData, the 14-viewport projection loss, and the
    entropy rate net on the quantized latents -- runs on the gathered
    result. Loss and gradients equal the single-device
    ``parallel.train._loss_terms`` (adjoint of ppermute is the reverse
    ppermute, so autodiff of the halo exchange is exact); oracle-tested on
    the CPU mesh in tests/test_spatial_sharding.py.

    Returns a jitted fn(params, x) -> ((loss, (mse, ssim_loss, rate,
    hist)), grads) for a single image x: (1, 3, H, W).
    """
    import jax.numpy as jnp
    from jax import shard_map

    from pseudocylindrical_convolution_tpu.models.cmpnet import _code_mask
    from pseudocylindrical_convolution_tpu.models.entropy import (
        entropy_net_apply)
    from pseudocylindrical_convolution_tpu.models.transform import (
        decoder_apply, encoder_apply)
    from pseudocylindrical_convolution_tpu.ops.bandctx import LocalBands
    from pseudocylindrical_convolution_tpu.ops.clip import clip_data
    from pseudocylindrical_convolution_tpu.ops.dtow import dtow
    from pseudocylindrical_convolution_tpu.ops.projects import multi_project
    from pseudocylindrical_convolution_tpu.ops.quant import pseudo_quant
    from pseudocylindrical_convolution_tpu.ops.slice import (sphere_slice,
                                                             sphere_uslice)
    from pseudocylindrical_convolution_tpu.ops.ssim import ssim

    nd = mesh.devices.size
    assert geom.npart % nd == 0, "npart must divide the band mesh"
    ctx = LocalBands(geom, nd, axis_name="band")

    def transform_local(params, tiles_l, qmask_l):
        code = encoder_apply(params["encoder"], tiles_l, ctx, cfg._tdtype)
        # norm=npart: keep the histogram / centroid-fit weight-grad
        # divisor at the GLOBAL tile count so the psum below (and the
        # implicit grad psum for the replicated weights) reproduces the
        # single-device op exactly.
        code_f, code_i, hist = pseudo_quant(
            code, params["quant"]["weight"], qmask_l, cfg.top_alpha,
            geom.npart)
        vm = (jnp.arange(cfg.code_channels) < cfg.valid_dim
              ).astype(code_f.dtype)[None, :, None, None]
        tx_l = decoder_apply(params["decoder"], code_f * vm, ctx, cfg._tdtype)
        # per-channel usage histogram is a global sum over bands
        hist = jax.lax.psum(hist, "band")
        return tx_l, code_i, hist

    sharded = shard_map(
        transform_local, mesh=mesh,
        in_specs=(P(), P("band"), P("band")),
        out_specs=(P("band"), P("band"), P()), check_vma=False)

    def loss_fn(params, x):
        tiles = sphere_slice(x, geom)
        qmask = _code_mask(geom, 1, tiles.shape[2] // 16, tiles.shape[3] // 16)
        tx, code_i, hist = sharded(params, tiles, qmask)
        y = clip_data(sphere_uslice(tx, geom))
        # entropy branch (latents are 16x smaller than the image; GSPMD
        # keeps it band-sharded from code_i's sharding)
        hcode = dtow(code_i[:, : cfg.valid_dim], 2, True)
        ent_vec, mask = entropy_net_apply(params["ent"],
                                          hcode - cfg.mean_val, geom,
                                          cfg.ngroup, drop=cfg.init)
        vp = lw.viewport_size
        py = multi_project(y, vp, int(vp * 1.5), 0.5)
        px = multi_project(x, vp, int(vp * 1.5), 0.5)
        mse = jnp.mean((px - py) ** 2)
        ssim_loss = 1.0 - ssim(px, py)
        rate = jnp.sum(ent_vec) / jax.lax.stop_gradient(jnp.sum(mask))
        loss = lw.gamma * mse + lw.beta * ssim_loss + lw.alpha * rate
        return loss, (mse, ssim_loss, rate, hist)

    def fn(params, x):
        assert x.shape[0] == 1, "spatial parallelism is single-image"
        return jax.value_and_grad(loss_fn, has_aux=True)(params, x)

    return jax.jit(fn)


def make_band_train_step(cfg: CMPNetConfig, geom: Geometry, lw, tx_other,
                         tx_ent, mesh: Mesh, check_iters: int = 100,
                         count_lr: float = 1e-3, count_decay: float = 0.9):
    """Band-parallel training step: TrainState in/out with the SAME
    three-optimizer / quantizer-maintenance / clip semantics as
    ``parallel.train.make_train_step`` (oracle-tested equal to it at
    acc_batch=1), but gradients from :func:`band_sharded_loss_grads` --
    the transform convs sharded over latitude bands. For high-resolution
    single-image training where one device cannot hold the activations.

    Returns step(state, x, train_ent) for x: (1, 3, H, W); wrap with
    ``jax.jit(..., static_argnums=2)`` (train_ent selects the phase
    statically, exactly like shard_train_step does for the DP step).
    """
    import jax.numpy as jnp
    import optax

    from pseudocylindrical_convolution_tpu.ops.quant import (
        quant_update_weight)
    from pseudocylindrical_convolution_tpu.parallel.train import (
        TrainState, _clip_by_global_norm, _merge, _split)

    vag = band_sharded_loss_grads(cfg, geom, lw, mesh)

    def step(state: "TrainState", x, train_ent: bool):
        params = state.params
        count = state.count
        do_upd = (state.step > 0) & (state.step % check_iters == 0)
        new_w = quant_update_weight(params["quant"]["weight"], count)
        qweight = jnp.where(do_upd, new_w, params["quant"]["weight"])
        count = jnp.where(do_upd, count * count_decay, count)
        params = {**params, "quant": {"weight": qweight}}

        (loss, aux), grads = vag(params, x)
        count = count - count_lr * aux[3]        # SGD on the usage counter

        g_other, g_ent = _split(grads)
        p_other, p_ent = _split(params)
        if train_ent:
            g_ent = _clip_by_global_norm(g_ent, lw.clip)
            upd, opt_ent = tx_ent.update(g_ent, state.opt_ent, p_ent)
            p_ent = optax.apply_updates(p_ent, upd)
            opt_other = state.opt_other
        else:
            g_other = _clip_by_global_norm(g_other, lw.clip)
            upd, opt_other = tx_other.update(g_other, state.opt_other,
                                             p_other)
            p_other = optax.apply_updates(p_other, upd)
            opt_ent = state.opt_ent
        new_state = TrainState(params=_merge(p_other, p_ent), count=count,
                               opt_other=opt_other, opt_ent=opt_ent,
                               step=state.step + 1)
        return new_state, {"loss": loss, "mse": aux[0],
                           "ssim_loss": aux[1], "rate": aux[2]}

    return step
