"""A/B the scan-codec executable knobs on the current backend.

Times full encode-mode and decode-mode dispatches of the 238-step scan
program across (conv_chunks, lanes, batch) variants.

KNOWN ISSUE: at 2048x4096 this harness printed ~1 ms totals on the v5e
while the identical call pattern run standalone measured 17-20 s
(tools/prof_scan_manual.py, the trusted harness). Root cause untracked;
prefer prof_scan_manual.py for anything above 512x1024.

Usage: python tools/prof_scan_variants.py [--vd 192] [--iters 3]
       [--chunks 1 2 3 4] [--lanes 256] [--batch 1]
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vd", type=int, default=192)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--chunks", type=int, nargs="*", default=[1, 2, 3, 4])
    ap.add_argument("--lanes", type=int, nargs="*", default=[256])
    ap.add_argument("--batch", type=int, nargs="*", default=[1])
    ap.add_argument("--window", nargs="*", default=["gather"])
    ap.add_argument("--hoist", type=int, nargs="*", default=[0])
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        ScanWavefrontCodec)

    print("devices:", jax.devices())
    cfg = CMPNetConfig(valid_dim=args.vd, channels=192, code_channels=192,
                       npart=16)
    geom = cfg.geometry()
    H, W = args.hw
    h, w = H // geom.npart // 8, W // 8
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)

    for nch, L, B, wm, ho in itertools.product(args.chunks, args.lanes,
                                               args.batch, args.window,
                                               args.hoist):
        codec = ScanWavefrontCodec(cfg, geom, h, w, batch=B, lanes=L,
                                   conv_chunks=nch, window_mode=wm,
                                   hoist=bool(ho))
        codec.prepare(params["ent"])
        teacher = jnp.zeros((B, codec.P), jnp.int32)
        zwords = jnp.zeros((B * codec.NW,), jnp.uint32)
        zoff = jnp.zeros((B, L), jnp.int32)
        znb = jnp.zeros((B, L), jnp.uint32)

        def timeit(fn):
            o = fn()
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fn()
                jax.block_until_ready(o)
            return (time.perf_counter() - t0) / args.iters

        te = timeit(lambda: codec._run(zwords, zoff, znb, teacher,
                                       decode=False))
        td = timeit(lambda: codec._run(zwords, zoff, znb, teacher,
                                       decode=True))
        print(f"chunks={nch} lanes={L} B={B} win={wm} hoist={ho}: "
              f"enc {te*1e3:7.0f} ms ({te/codec.nsteps*1e3:5.2f} ms/step)  "
              f"dec {td*1e3:7.0f} ms ({td/codec.nsteps*1e3:5.2f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
