"""Data-parallel training step (TPU mesh version of trainDDP_Full.py).

The reference trains with torch DDP over NCCL (trainDDP_Full.py:83-159):
per-GPU forward/backward, allreduced grads, manual gradient accumulation
(acc_batch=3), grad-norm clip 0.1, three optimizers (Adam on encoder/decoder/
quant.weight, Adam 10x lr on the entropy net, SGD on the quantizer's usage
counter), and epochs alternating between the E/D phase and the entropy phase.

TPU-native equivalent: one jitted SPMD step over a ('data',) mesh built with
shard_map -- batch sharded, params replicated, `jax.lax.pmean` for the DDP
allreduce; gradient accumulation is an in-step `lax.scan` over micro-batches.
All of the reference's process-group plumbing collapses into sharding
annotations.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig, cmpnet_apply
from pseudocylindrical_convolution_tpu.ops.projects import multi_project
from pseudocylindrical_convolution_tpu.ops.quant import quant_update_weight
from pseudocylindrical_convolution_tpu.ops.ssim import ssim


@dataclasses.dataclass(frozen=True)
class LossWeights:
    gamma: float = 1.0   # MSE
    beta: float = 0.0    # 1 - SSIM
    alpha: float = 1.0   # rate
    clip: float = 0.1
    viewport_size: int = 171


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    count: Any            # quantizer usage counter (C, bins)
    opt_other: Any        # Adam state for encoder/decoder/quant.weight
    opt_ent: Any          # Adam state for entropy net
    step: Any


def _split(params):
    other = {"encoder": params["encoder"], "decoder": params["decoder"],
             "quant": params["quant"]}
    ent = {"ent": params["ent"]}
    return other, ent


def _merge(other, ent):
    return {**other, **ent}


def create_train_state(params, cfg: CMPNetConfig, lr: float = 1e-4):
    other, ent = _split(params)
    tx_other = optax.adam(lr)
    tx_ent = optax.adam(lr * 10)
    return (TrainState(params=params,
                       count=jnp.zeros_like(params["quant"]["weight"]),
                       opt_other=tx_other.init(other),
                       opt_ent=tx_ent.init(ent),
                       step=jnp.zeros((), jnp.int32)),
            tx_other, tx_ent)


def _loss_terms(params, batch, cfg: CMPNetConfig, geom: Geometry,
                lw: LossWeights):
    y, ent_vec, mask, hist = cmpnet_apply(params, batch, cfg, geom)
    vp = lw.viewport_size
    py = multi_project(y, vp, int(vp * 1.5), 0.5)
    px = multi_project(batch, vp, int(vp * 1.5), 0.5)
    mse = jnp.mean((px - py) ** 2)
    ssim_loss = 1.0 - ssim(px, py)
    rate = jnp.sum(ent_vec) / jax.lax.stop_gradient(jnp.sum(mask))
    loss = lw.gamma * mse + lw.beta * ssim_loss + lw.alpha * rate
    return loss, (mse, ssim_loss, rate, hist)


def _clip_by_global_norm(tree, clip):
    leaves = jax.tree_util.tree_leaves(tree)
    norm = jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
    scale = jnp.minimum(1.0, clip / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda l: l * scale, tree)


def make_train_step(cfg: CMPNetConfig, geom: Geometry, lw: LossWeights,
                    tx_other, tx_ent, acc_batch: int = 3,
                    check_iters: int = 100, count_lr: float = 1e-3,
                    count_decay: float = 0.9, axis_name: str | None = None):
    """Returns step(state, batch, train_ent) -> (state, metrics).

    batch: (acc_batch, micro_batch, 3, H, W). train_ent selects the phase
    (True: entropy params; False: encoder/decoder/quant.weight) statically.
    """

    def step(state: TrainState, batch, train_ent: bool):
        params = state.params
        count = state.count
        # quantizer maintenance every check_iters steps (update_weight +
        # count decay; pseudo_quant_cuda.cu:126-143)
        do_upd = (state.step > 0) & (state.step % check_iters == 0)
        new_w = quant_update_weight(params["quant"]["weight"], count)
        qweight = jnp.where(do_upd, new_w, params["quant"]["weight"])
        count = jnp.where(do_upd, count * count_decay, count)
        params = {**params, "quant": {"weight": qweight}}

        def micro(carry, xb):
            gacc, cnt = carry
            (loss, aux), grads = jax.value_and_grad(
                _loss_terms, has_aux=True)(params, xb, cfg, geom, lw)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            # SGD on the usage counter every micro batch
            # (count grad = negative histogram; trainDDP_Full.py:44,139)
            hist = aux[3]
            if axis_name is not None:
                hist = jax.lax.pmean(hist, axis_name)
            cnt = cnt - count_lr * hist
            return (gacc, cnt), (loss, aux[0], aux[1], aux[2])

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
        (gsum, count), metrics = jax.lax.scan(micro, (zero_g, count), batch)
        if axis_name is not None:
            gsum = jax.lax.pmean(gsum, axis_name)
        g_other, g_ent = _split(gsum)
        p_other, p_ent = _split(params)
        if train_ent:
            g_ent = _clip_by_global_norm(g_ent, lw.clip)
            upd, opt_ent = tx_ent.update(g_ent, state.opt_ent, p_ent)
            p_ent = optax.apply_updates(p_ent, upd)
            opt_other = state.opt_other
        else:
            g_other = _clip_by_global_norm(g_other, lw.clip)
            upd, opt_other = tx_other.update(g_other, state.opt_other, p_other)
            p_other = optax.apply_updates(p_other, upd)
            opt_ent = state.opt_ent
        new_state = TrainState(params=_merge(p_other, p_ent), count=count,
                               opt_other=opt_other, opt_ent=opt_ent,
                               step=state.step + 1)
        m = jax.tree_util.tree_map(jnp.mean, metrics)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        return new_state, {"loss": m[0], "mse": m[1], "ssim_loss": m[2],
                           "rate": m[3]}

    return step


def make_eval_step(cfg: CMPNetConfig, geom: Geometry, lw: LossWeights):
    @functools.partial(jax.jit, static_argnums=())
    def eval_step(params, batch):
        _, (mse, ssim_loss, rate, _) = _loss_terms(params, batch, cfg, geom,
                                                   lw)
        return {"mse": mse, "ssim": 1.0 - ssim_loss, "rate": rate}

    return eval_step
