"""Training driver: epochs, alternating phases, validation, checkpointing.

Behavioral reference: test/trainDDP_Full.py (Job/train/test/main). The torch
mp.spawn + DDP plumbing is replaced by a single SPMD program over a
('data',) mesh; everything else (loss weights, alternating E/D vs entropy
epochs, RD-anchored validation loss, best/latest checkpoints) is preserved.

Run: python -m pseudocylindrical_convolution_tpu.train.loop --valid-dim 192
     --alpha 1 --img-dir ... --train-list ... --test-list ...
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig, cmpnet_init
from pseudocylindrical_convolution_tpu.parallel.mesh import make_mesh, shard_train_step
from pseudocylindrical_convolution_tpu.parallel.train import (
    LossWeights, create_train_state, make_eval_step, make_train_step)
from pseudocylindrical_convolution_tpu.train.dataset import (
    BalancedWindowSampler, SphereDataset, batch_iterator)
from pseudocylindrical_convolution_tpu.train.rdmetric import (
    mse_anchor, ssim_anchor)
from pseudocylindrical_convolution_tpu.utils.checkpoint import (
    ModelSaver, is_train_state_file, load_params, load_train_state,
    save_params)
from pseudocylindrical_convolution_tpu.utils.logger import Logger


def validate(eval_step, params, dataset, indices, batch_size, valid_dim, log,
             beta: float = 0.0):
    """trainDDP_Full.py:56-81: mean metrics + RD-anchor-normalized loss.

    The reference selects checkpoints on the MSE anchor even for SSIM-loss
    runs (trainDDP_Full.py:79 uses mse_tb unconditionally; ssim_tb is
    imported but never used). Here an SSIM-family run (beta > 0) is anchored
    on the SSIM curve (test/RDMetric.py:12-13): tloss = anchor_ssim(rate) -
    test_ssim, lower = better, zero = on the paper's curve."""
    mses, ssims, ents = [], [], []
    for s in range(0, len(indices) - batch_size + 1, batch_size):
        batch = np.stack([dataset[int(i)]
                          for i in indices[s: s + batch_size]])
        m = eval_step(params, jnp.asarray(batch))
        mses.append(float(m["mse"]))
        ssims.append(float(m["ssim"]))
        ents.append(float(m["rate"]))
    test_mse = float(np.mean(mses)) if mses else 0.0
    test_ssim = float(np.mean(ssims)) if ssims else 0.0
    test_ent = float(np.mean(ents)) if ents else 0.0
    vd = valid_dim / 256.0 * 0.815
    real_rt = vd * test_ent / 0.693
    log.log(f"Test: MSE {test_mse:.6f}  SSIM {test_ssim:.4f} "
            f"Ent {test_ent:.3f} rt {real_rt:.3f}bpp")
    if beta > 0:
        rt_loss = float(ssim_anchor(real_rt)) - test_ssim
    else:
        rt_loss = test_mse - float(mse_anchor(real_rt))
    log.log(f"tloss: {rt_loss}")
    return [rt_loss]


def run(args):
    cfg = CMPNetConfig(valid_dim=args.valid_dim, channels=args.channels,
                       code_channels=args.code_dim, npart=args.npart,
                       opt=args.opt, init=args.init,
                       top_alpha=0.01 if args.beta > 0 else 1e-4)
    geom = cfg.geometry()
    lw = LossWeights(gamma=args.gamma, beta=args.beta, alpha=args.alpha,
                     clip=args.clip, viewport_size=args.viewport_size)
    # use at most batch_size devices so a small batch still shards evenly
    # (e.g. batch 1 on an 8-device host runs on 1 device)
    ndev = len(jax.devices())
    while args.batch_size % ndev != 0:
        ndev -= 1
    mesh = make_mesh(ndev)

    params = cmpnet_init(jax.random.PRNGKey(args.seed), cfg)
    prefix = (f"ent_{'opt' if args.opt else 'normal'}_{args.channels}_"
              f"{args.valid_dim}_{args.npart}")
    if args.init:
        prefix += "_init"
    os.makedirs(args.save_dir, exist_ok=True)
    log = Logger(os.path.join(args.save_dir, f"{prefix}_log.txt"))
    resume_state = None
    if args.resume and os.path.exists(args.resume):
        if is_train_state_file(args.resume):
            # full resume: params + quant count + optimizer states + step
            # continue bit-exactly (the reference checkpoints `count` as a
            # parameter, PseudoContextV2.py:250; we restore Adam moments too)
            resume_state = load_train_state(args.resume)
            params = resume_state["params"]
            log.log(f"resumed full train state {args.resume} "
                    f"(step {int(resume_state['step'])})")
        else:
            params = load_params(args.resume)
            log.log(f"loaded {args.resume}")
    elif args.init_from and os.path.exists(args.init_from):
        # staged init (trainDDP_Full.py:88-95 init_with_trained_model):
        # adopt every subtree whose leaf shapes match (e.g. encoder/decoder/
        # quant from a different-rate checkpoint); keep fresh init elsewhere
        # (the entropy net's shapes depend on valid_dim).
        src = load_params(args.init_from)
        kept, skipped = [], []
        for key, sub in src.items():
            if key not in params:
                skipped.append(key)
                continue
            ok = (jax.tree_util.tree_structure(params[key])
                  == jax.tree_util.tree_structure(sub))
            if ok:
                ok = jax.tree_util.tree_all(jax.tree.map(
                    lambda a, b: np.shape(a) == np.shape(b),
                    params[key], sub))
            (kept if ok else skipped).append(key)
            if ok:
                params[key] = jax.tree.map(jnp.asarray, sub)
        log.log(f"init from {args.init_from}: adopted {kept}, "
                f"fresh {skipped}")

    state, tx_other, tx_ent = create_train_state(params, cfg, args.lr)
    if resume_state is not None:
        import dataclasses as _dc
        state = _dc.replace(state, count=resume_state["count"],
                            opt_other=resume_state["opt_other"],
                            opt_ent=resume_state["opt_ent"],
                            step=resume_state["step"])
    step_fn = make_train_step(cfg, geom, lw, tx_other, tx_ent,
                              acc_batch=args.acc_batch, axis_name="data")
    step_ent = shard_train_step(step_fn, mesh, True)
    step_other = shard_train_step(step_fn, mesh, False)
    eval_step = make_eval_step(cfg, geom, lw)
    # best-loss memory persists only across true segmented resumes (full
    # TrainState continuation); any fresh/finetune run resets it so the run
    # is guaranteed to write its own {prefix}_best_i.pkl (ADVICE r3).
    saver = ModelSaver(args.save_dir, prefix, resume=resume_state is not None)

    train_ds = SphereDataset(args.img_dir, args.train_list)
    test_ds = SphereDataset(args.img_dir, args.test_list)
    if args.difficulty_dict and os.path.exists(args.difficulty_dict):
        sampler = BalancedWindowSampler(train_ds, args.difficulty_dict, 1, 0,
                                        args.batch_size, args.acc_batch,
                                        mean=1.5, seed=args.seed)
    else:
        sampler = None
    test_idx = np.arange(len(test_ds))

    for epoch in range(1, args.epochs + 1):
        t_epoch = time.perf_counter()
        # --base: reconstruction-only pretraining of encoder/decoder/quant
        # (the reference's trainDDP_Base phase); --init: entropy-only.
        train_ent = (not args.base) and (args.init or (epoch % 4 != 1))
        step = step_ent if train_ent else step_other
        idxs = (sampler.epoch_indices(epoch) if sampler
                else np.random.RandomState(args.seed + epoch
                                           ).permutation(len(train_ds)))
        for bi, macro in enumerate(batch_iterator(train_ds, idxs,
                                                  args.batch_size,
                                                  args.acc_batch)):
            state, metrics = step(state, jnp.asarray(macro))
            # pulling metrics forces a device->host sync; logging every
            # batch serializes the step stream (each float() stalls the
            # dispatch pipeline -- ~2x wall time through the axon tunnel).
            # Log periodically so steps pipeline on device.
            if bi % args.log_every == 0:
                log.log(f"Epoch {epoch} [{bi}] "
                        f"loss {float(metrics['loss']):.6f} "
                        f"mse {float(metrics['mse']):.6f} "
                        f"ssim {1 - float(metrics['ssim_loss']):.3f} "
                        f"rate {float(metrics['rate']):.3f}")
        ls = validate(eval_step, state.params, test_ds, test_idx,
                      args.test_batch_size, args.valid_dim, log,
                      beta=args.beta)
        log.log(saver.save(state.params, ls, state=state))
        log.log(f"epoch {epoch} wall {time.perf_counter() - t_epoch:.1f}s")
    save_params(state.params, os.path.join(args.save_dir, f"{prefix}_final.pkl"))


def build_argparser():
    p = argparse.ArgumentParser(description="TPU 360 compression training")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--acc-batch", type=int, default=3)
    p.add_argument("--test-batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--valid-dim", type=int, default=192)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=0.0)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--clip", type=float, default=0.1)
    p.add_argument("--opt", action="store_true", default=True)
    p.add_argument("--init", action="store_true", default=False)
    p.add_argument("--base", action="store_true", default=False,
                   help="reconstruction-only pretraining (trainDDP_Base)")
    p.add_argument("--viewport_size", type=int, default=171)
    p.add_argument("--channels", type=int, default=192)
    p.add_argument("--code-dim", type=int, default=192)
    p.add_argument("--npart", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-every", type=int, default=10,
                   help="log training metrics every N macro batches (1 = "
                        "reference behavior; each log line costs a "
                        "device->host sync)")
    p.add_argument("--img-dir", type=str, required=True)
    p.add_argument("--train-list", type=str, required=True)
    p.add_argument("--test-list", type=str, required=True)
    p.add_argument("--difficulty-dict", type=str, default="")
    p.add_argument("--save-dir", type=str, default="./saved_models")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--init-from", type=str, default="",
                   help="partial-init from a checkpoint: adopt shape-"
                        "matching subtrees (staged training across rate "
                        "points, trainDDP_Full.py:88-95)")
    return p


if __name__ == "__main__":
    run(build_argparser().parse_args())
