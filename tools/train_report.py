"""Summarize a training log (train/loop.py output) into a markdown table.

Usage: python tools/train_report.py /tmp/train_base.log [...more logs]

Pulls the per-epoch validation lines (Test: MSE/SSIM/Ent/rt + tloss) and the
last train step of each epoch; prints a markdown table with the RD-anchor
comparison (tloss = validation MSE minus the anchor MSE at the measured
rate; negative or shrinking = converging toward the reference's RD curve).
"""

import re
import sys


def parse(fname):
    rows = []
    epoch = None
    last_train = {}
    for ln in open(fname):
        m = re.search(r"Epoch (\d+) \[(\d+)\] loss ([\d.eE+-]+) mse "
                      r"([\d.eE+-]+) ssim ([\d.eE+-]+) rate ([\d.eE+-]+)", ln)
        if m:
            epoch = int(m.group(1))
            last_train[epoch] = dict(loss=float(m.group(3)),
                                     mse=float(m.group(4)),
                                     ssim=float(m.group(5)),
                                     rate=float(m.group(6)))
        m = re.search(r"Test: MSE ([\d.eE+-]+)\s+SSIM ([\d.eE+-]+) Ent "
                      r"([\d.eE+-]+) rt ([\d.eE+-]+)bpp", ln)
        if m and epoch is not None:
            rows.append(dict(epoch=epoch, mse=float(m.group(1)),
                             ssim=float(m.group(2)), ent=float(m.group(3)),
                             bpp=float(m.group(4)),
                             train=last_train.get(epoch, {})))
        m = re.search(r"tloss: ([\d.eE+-]+)", ln)
        if m and rows:
            rows[-1]["tloss"] = float(m.group(1))
    return rows


def main():
    for fname in sys.argv[1:]:
        rows = parse(fname)
        print(f"### {fname} ({len(rows)} validated epochs)\n")
        print("| epoch | val MSE | val MSE (255^2) | val SSIM | rate (nats)"
              " | bpp | tloss (MSE - anchor) |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['epoch']} | {r['mse']:.6f} | "
                  f"{r['mse'] * 255 * 255:.1f} | {r['ssim']:.4f} | "
                  f"{r['ent']:.3f} | {r['bpp']:.3f} | "
                  f"{r.get('tloss', float('nan')):.5f} |")
        print()


if __name__ == "__main__":
    main()
