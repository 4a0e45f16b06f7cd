"""Measure the RD-anchor tloss of a checkpoint on the synthetic test set.

Runs the exact make_eval_step/validate path train/loop.py uses each epoch
and prints one `TLOSS <float>` line. tools/r4_rebuild.sh uses it to seed
install gates after a machine reset wiped the training logs and saver
sidecars: the installed registry checkpoint survives in git, but the
tloss that justified installing it does not, and a relaunched segment
with a fresh Adam can regress below it. Gating installs on beating this
measured number keeps the registry monotone.

Usage: python tools/eval_tloss.py --ckpt demo/mse/10_192.pkl \
           --valid-dim 192 --img-dir /tmp/synth360 \
           --test-list /tmp/synth360/test.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Print:
    def log(self, msg):
        print(msg, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--valid-dim", type=int, required=True)
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--test-list", required=True)
    ap.add_argument("--test-batch-size", type=int, default=2)
    ap.add_argument("--beta", type=float, default=0.0,
                    help=">0 anchors on the SSIM curve (SSIM-family runs)")
    args = ap.parse_args()

    import numpy as np

    from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig
    from pseudocylindrical_convolution_tpu.parallel.train import (
        LossWeights, make_eval_step)
    from pseudocylindrical_convolution_tpu.train.dataset import SphereDataset
    from pseudocylindrical_convolution_tpu.train.loop import validate
    from pseudocylindrical_convolution_tpu.utils.checkpoint import load_params

    # mirror train/loop.py:69-75 so the eval program (and its compile-cache
    # entry) is byte-identical to the one training validation dispatches
    cfg = CMPNetConfig(valid_dim=args.valid_dim,
                       top_alpha=0.01 if args.beta > 0 else 1e-4)
    geom = cfg.geometry()
    lw = LossWeights(beta=args.beta)
    eval_step = make_eval_step(cfg, geom, lw)
    params = load_params(args.ckpt)
    ds = SphereDataset(args.img_dir, args.test_list)
    ls = validate(eval_step, params, ds, np.arange(len(ds)),
                  args.test_batch_size, args.valid_dim, _Print(),
                  beta=args.beta)
    print(f"TLOSS {ls[0]}", flush=True)


if __name__ == "__main__":
    main()
