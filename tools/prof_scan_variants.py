"""A/B the scan-codec executable knobs on the current backend.

Times full encode-mode and decode-mode dispatches of the whole-image scan
program across (window_mode, conv_chunks, lanes, batch, pad_mode) variants.

Each config runs in a FRESH subprocess via tools/prof_scan_manual.py (the
validated timing pattern). The old in-process sweep printed bogus ~1 ms
totals at 2048x4096 on the v5e while the identical call pattern in a fresh
process measured 17-20 s/dispatch; the per-codec device constants of a
high-res sweep add up to GBs in one process (814-step xs tables), so
process isolation is the trustworthy harness by construction.

Usage: python tools/prof_scan_variants.py [--vd 192] [--iters 3]
       [--chunks 1 2 3 4] [--lanes 256] [--window gather burst]
       [--pad gather mm] [--hw 512 1024]
"""

import argparse
import itertools
import os
import subprocess
import sys

TOOLS = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vd", type=int, default=192)
    ap.add_argument("--npart", type=int, default=16)
    ap.add_argument("--channels", type=int, default=192)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chunks", type=int, nargs="*", default=[1, 2, 3, 4])
    ap.add_argument("--lanes", type=int, nargs="*", default=[256])
    ap.add_argument("--window", nargs="*", default=["gather"])
    ap.add_argument("--pad", nargs="*", default=["gather"])
    args = ap.parse_args()

    for wm, nch, L, pad in itertools.product(args.window, args.chunks,
                                             args.lanes, args.pad):
        if pad == "mm" and wm != "burst":
            continue
        cmd = [sys.executable, os.path.join(TOOLS, "prof_scan_manual.py"),
               "--vd", str(args.vd), "--npart", str(args.npart),
               "--channels", str(args.channels), "--hw", str(args.hw[0]),
               str(args.hw[1]), "--iters", str(args.iters),
               "--configs", f"{wm}:{nch}:{L}:{pad}"]
        if args.cpu:
            cmd.append("--cpu")
        r = subprocess.run(cmd, capture_output=True, text=True)
        for line in r.stdout.splitlines():
            if "decode=" in line:
                print(line, flush=True)
        if r.returncode != 0:
            print(f"{wm}:{nch}:{L}:{pad}: FAILED rc={r.returncode}\n"
                  f"{r.stderr[-500:]}", flush=True)


if __name__ == "__main__":
    main()
