"""Per-image difficulty scores for the balanced sampler.

The reference ships a precomputed `train_val.dic` pickle (SphereDataset.py:39)
without the generator. Difficulty here = encode bpp under a trained model
(images that cost more bits are 'harder'), falling back to a fast
gradient-energy proxy when no model is given.

  python -m pseudocylindrical_convolution_tpu.train.difficulty \
      --img-dir D --list train.txt --out train_val.dic [--model m.pkl ...]
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def gradient_energy(img: np.ndarray) -> float:
    """Cheap texture proxy: mean |dx| + |dy| over the image in [0,1]."""
    g = img.mean(axis=0)
    return float(np.abs(np.diff(g, axis=0)).mean()
                 + np.abs(np.diff(g, axis=1)).mean()) * 100.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--list", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="",
                    help="optional .pkl params; difficulty = encode bpp")
    ap.add_argument("--valid-dim", type=int, default=192)
    args = ap.parse_args()

    from pseudocylindrical_convolution_tpu.train.dataset import load_image
    with open(args.list) as f:
        names = [ln.rstrip("\n") for ln in f if ln.strip()]
    scores = {}
    if args.model:
        import jax.numpy as jnp
        from pseudocylindrical_convolution_tpu.models.cmpnet import (
            CMPNetConfig)
        from pseudocylindrical_convolution_tpu.codec.pipeline import (
            encode_image)
        from pseudocylindrical_convolution_tpu.utils.checkpoint import (
            load_params)
        cfg = CMPNetConfig(valid_dim=args.valid_dim,
                           transform_dtype="bfloat16")
        geom = cfg.geometry()
        params = load_params(args.model)
        for n in names:
            x = jnp.asarray(load_image(os.path.join(args.img_dir, n))[None])
            size = encode_image(params, x, cfg, geom, "/tmp/_diff.bin")
            scores[n.replace("npy", "png")] = size * 8 / 1024.0 / 512.0
    else:
        for n in names:
            img = load_image(os.path.join(args.img_dir, n))
            scores[n.replace("npy", "png")] = gradient_energy(img)
    with open(args.out, "wb") as f:
        pickle.dump(scores, f)
    vals = np.array(list(scores.values()))
    print(f"wrote {args.out}: {len(scores)} images, "
          f"mean {vals.mean():.3f} min {vals.min():.3f} max {vals.max():.3f}")


if __name__ == "__main__":
    main()
