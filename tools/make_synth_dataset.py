"""Generate a synthetic 360 (ERP) image dataset for RD training evidence.

No real 360 dataset is downloadable in this environment (the reference's
data lives on Baidu Netdisk, Dataset.md), so training-convergence evidence
uses procedurally generated ERP images: multi-octave value noise (natural
1/f-ish spectra), horizon/sky gradients in latitude, and a few rectilinear
shapes warped through the equirectangular projection so statistics vary with
latitude the way real ERP content does (oversampled poles).

Writes uint8 HWC .npy files (SphereDataset.load_image handles .npy) plus
train/test list files and a difficulty dict for the balanced sampler.

Usage: python tools/make_synth_dataset.py --out /tmp/synth360 --n-train 256
       --n-test 16 [--hw 512 1024]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _upsample(a, shape):
    """Bilinear upsample a (h, w) array to shape (zoom without scipy)."""
    h, w = a.shape
    H, W = shape
    yi = np.linspace(0, h - 1, H)
    xi = np.linspace(0, w - 1, W)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (yi - y0)[:, None]
    fx = (xi - x0)[None, :]
    return (a[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + a[np.ix_(y1, x0)] * fy * (1 - fx)
            + a[np.ix_(y0, x1)] * (1 - fy) * fx
            + a[np.ix_(y1, x1)] * fy * fx)


def _value_noise(rng, hw, octaves=6, persistence=0.55):
    H, W = hw
    out = np.zeros(hw, np.float32)
    amp, tot = 1.0, 0.0
    for o in range(octaves):
        h, w = max(2, H >> (octaves - 1 - o)), max(2, W >> (octaves - 1 - o))
        out += amp * _upsample(rng.standard_normal((h, w)).astype(np.float32),
                               hw)
        tot += amp
        amp *= persistence
    return out / tot


def make_erp_image(rng, hw=(512, 1024)):
    H, W = hw
    lat = np.linspace(-np.pi / 2, np.pi / 2, H)[:, None]      # (H,1)
    lon = np.linspace(-np.pi, np.pi, W)[None, :]

    # latitude gradient (sky/ground) with random orientation strength
    base = np.tanh(lat * rng.uniform(0.5, 3)) * rng.uniform(0.1, 0.4)
    img = np.zeros((H, W, 3), np.float32)
    tint = rng.uniform(0.3, 0.7, 3)
    for c in range(3):
        n = _value_noise(rng, hw, octaves=int(rng.integers(5, 8)))
        img[..., c] = tint[c] + base * rng.uniform(-1, 1) \
            + n * rng.uniform(0.1, 0.35)

    # ERP-warped blobs: place K 3D directions, intensity falls off with
    # angular distance -> properly pole-stretched features in ERP
    K = int(rng.integers(3, 9))
    cl = np.cos(lat); sl = np.sin(lat)
    for _ in range(K):
        v = rng.standard_normal(3)
        v /= np.linalg.norm(v)
        cosang = (cl * np.cos(lon) * v[0] + cl * np.sin(lon) * v[1]
                  + sl * v[2])
        blob = np.exp((cosang - 1) / rng.uniform(0.005, 0.08))
        col = rng.uniform(-0.5, 0.5, 3)
        img += blob[..., None] * col[None, None, :]

    # a horizon band of high-frequency texture (equator detail)
    n2 = _value_noise(rng, hw, octaves=8, persistence=0.7)
    band = np.exp(-(lat / rng.uniform(0.2, 0.6)) ** 2)
    img += (n2 * band)[..., None] * rng.uniform(0.05, 0.25)

    img = np.clip(img, 0, 1)
    return (img * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/synth360")
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-test", type=int, default=16)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    names = {"train": [], "test": []}
    for split, n in (("train", args.n_train), ("test", args.n_test)):
        for i in range(n):
            img = make_erp_image(rng, tuple(args.hw))
            fn = f"{split}_{i:04d}.npy"
            np.save(os.path.join(args.out, fn), img)
            names[split].append(fn)
        with open(os.path.join(args.out, f"{split}.txt"), "w") as f:
            f.write("\n".join(names[split]) + "\n")
    # difficulty dict: image std as the proxy (the reference ships a
    # precomputed train_val.dic; tools also has a generator)
    diff = {fn: float(np.load(os.path.join(args.out, fn)).std() / 32.0)
            for fn in names["train"]}
    with open(os.path.join(args.out, "train_val.dic"), "wb") as f:
        pickle.dump(diff, f)
    print(f"wrote {args.n_train}+{args.n_test} images to {args.out}")


if __name__ == "__main__":
    main()
