"""RD-curve harness (BASELINE config 3): batch-encode an image list across
all available rate points and report bpp/PSNR/SSIM vs the anchor curves.

Usage:
  python tools/rd_curve.py --img-file list.txt [--ssim] [--model-indices 0 1]
         [--decode]   # full bitstream roundtrip (slow: compiles the scan
                      # decode program per valid_dim); without it, metrics
                      # come from the encode-side reconstruction, which the
                      # bit-exact roundtrip tests guarantee equals the
                      # decoded image (bpp is always from real streams)

Uses whatever checkpoints exist under demo/{mse,ssim} (pkl or converted
torch); skips missing rate points.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-file")
    ap.add_argument("--img-list", nargs="*")
    ap.add_argument("--ssim", action="store_true")
    ap.add_argument("--model-indices", nargs="*", type=int)
    ap.add_argument("--decode", action="store_true")
    ap.add_argument("--tmp", default="/tmp/rd_codes")
    args = ap.parse_args()

    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu import cli
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        encode_images, decode_image, _encode_latents_plane,
        _decode_image_from_latents)
    from pseudocylindrical_convolution_tpu.ops.projects import multi_project
    from pseudocylindrical_convolution_tpu.ops.ssim import ssim as ssim_fn
    from pseudocylindrical_convolution_tpu.ops.wspsnr import ws_psnr
    from pseudocylindrical_convolution_tpu.train.rdmetric import (
        mse_anchor, ssim_anchor)

    imgs = args.img_list or cli.read_list(args.img_file)
    names = cli.MODEL_SSIM_LIST if args.ssim else cli.MODEL_MSE_LIST
    indices = (args.model_indices if args.model_indices is not None
               else range(len(names)))
    os.makedirs(args.tmp, exist_ok=True)
    xs = [jnp.asarray(cli._read_image(fn)) for fn in imgs]
    # provenance tag so archived RD tables record which path produced the
    # metrics: a real bitstream decode vs the encode-side reconstruction
    # (equal by the bit-exactness tests, but a decode-path regression would
    # only surface in --decode tables)
    print("metrics: " + ("decoded (full bitstream roundtrip)" if args.decode
                         else "enc-recon (encode-side reconstruction)"))
    print(f"{'model':>8} {'bpp':>8} {'psnr':>8} {'ssim':>8} {'wspsnr':>8} "
          f"{'anchor':>10}")
    for mi in indices:
        try:
            cfg, geom, params = cli._setup(mi, not args.ssim)
        except FileNotFoundError:
            print(f"{names[mi]:>8} (no checkpoint, skipped)")
            continue
        fns = [os.path.join(args.tmp, f"{names[mi]}_{i}.bin")
               for i in range(len(imgs))]
        sizes = encode_images(params, xs, cfg, geom, fns)
        bpp = float(np.mean([s * 8 / 1024.0 / 512.0 for s in sizes]))
        if args.decode:
            recs = decode_image(params, cfg, geom, fns)
        else:
            # encode-side reconstruction: quantized latents -> dense
            # decoder. Equal to the decoded image whenever the scan
            # roundtrip is bit-exact (tests/test_wavefront_scan.py), and
            # avoids compiling the sequential decode program per valid_dim.
            recs = jnp.concatenate([
                _decode_image_from_latents(
                    params, _encode_latents_plane(params, x, cfg, geom)[0],
                    cfg, geom)
                for x in xs])
        prs, sss, wss = [], [], []
        for i, x in enumerate(xs):
            px = multi_project(x, 171, 256, 0.5)
            py = multi_project(recs[i:i + 1], 171, 256, 0.5)
            mse = float(jnp.mean((px - py) ** 2))
            prs.append(cli.psnr_f(mse))
            sss.append(float(ssim_fn(px, py)))
            wss.append(float(ws_psnr(x, jnp.asarray(recs[i:i + 1]))))
        psnr, vssim = float(np.mean(prs)), float(np.mean(sss))
        wsp = float(np.mean(wss))
        anchor = (float(ssim_anchor(bpp)) if args.ssim
                  else -10 * np.log10(float(mse_anchor(bpp))))
        print(f"{names[mi]:>8} {bpp:8.4f} {psnr:8.2f} {vssim:8.4f} "
              f"{wsp:8.2f} {anchor:10.4f}")


if __name__ == "__main__":
    main()
