"""Full-codec RD evaluation of an arbitrary checkpoint/valid_dim.

Like tools/rd_curve.py but driven by an explicit checkpoint path and
valid_dim instead of the reference model registry -- used for rate points
the registry doesn't name (any multiple of 4 works in this framework).

Usage: python tools/eval_ckpt.py --ckpt demo/train_run_vd96/..._best_0.pkl
           --valid-dim 96 --img-file /tmp/val_abs.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--valid-dim", type=int, required=True)
    ap.add_argument("--img-file", required=True)
    ap.add_argument("--tmp", default="/tmp/eval_codes")
    args = ap.parse_args()

    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu import cli
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        decode_image, encode_images)
    from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig
    from pseudocylindrical_convolution_tpu.ops.projects import multi_project
    from pseudocylindrical_convolution_tpu.ops.ssim import ssim as ssim_fn
    from pseudocylindrical_convolution_tpu.ops.wspsnr import ws_psnr
    from pseudocylindrical_convolution_tpu.train.rdmetric import mse_anchor
    from pseudocylindrical_convolution_tpu.utils.checkpoint import load_params

    cfg = CMPNetConfig(valid_dim=args.valid_dim)
    geom = cfg.geometry()
    params = load_params(args.ckpt)
    imgs = cli.read_list(args.img_file)
    xs = [jnp.asarray(cli._read_image(fn)) for fn in imgs]
    os.makedirs(args.tmp, exist_ok=True)
    fns = [os.path.join(args.tmp, f"e{i}.bin") for i in range(len(xs))]
    sizes = encode_images(params, xs, cfg, geom, fns)
    bpp = float(np.mean([s * 8 / 1024.0 / 512.0 for s in sizes]))
    recs = decode_image(params, cfg, geom, fns)
    prs, sss, wss = [], [], []
    for i, x in enumerate(xs):
        px = multi_project(x, 171, 256, 0.5)
        py = multi_project(recs[i:i + 1], 171, 256, 0.5)
        mse = float(jnp.mean((px - py) ** 2))
        prs.append(cli.psnr_f(mse))
        sss.append(float(ssim_fn(px, py)))
        wss.append(float(ws_psnr(x, jnp.asarray(recs[i:i + 1]))))
    anchor = -10 * np.log10(float(mse_anchor(bpp)))
    print(f"vd={args.valid_dim} bpp={bpp:.4f} psnr={np.mean(prs):.2f} "
          f"ssim={np.mean(sss):.4f} wspsnr={np.mean(wss):.2f} "
          f"anchor_psnr={anchor:.2f}")


if __name__ == "__main__":
    main()
