"""Manual scan-step profiler (validated timing pattern).

tools/prof_scan_variants.py showed bogus ~1 ms totals at 2048x4096 while
this direct pattern measured 17-20 s; until that is tracked down, this is
the trusted harness. One config per line:

  python tools/prof_scan_manual.py --hw 512 1024 \
      --configs gather:4:256 burst:4:256 burst:4:256:mm [--iters 2] [--cpu]

config syntax: window_mode:conv_chunks:lanes[:pad_mode]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vd", type=int, default=192)
    ap.add_argument("--npart", type=int, default=16)
    ap.add_argument("--channels", type=int, default=192)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1,
                    help="images per dispatch (B); ms/step is per step, so "
                    "per-image cost is ms/step * nsteps / B")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--configs", nargs="+", default=["gather:4:256"])
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        ScanWavefrontCodec)

    print("devices:", jax.devices(), flush=True)
    cfg = CMPNetConfig(valid_dim=args.vd, channels=args.channels,
                       code_channels=args.channels, npart=args.npart)
    geom = cfg.geometry()
    H, W = args.hw
    h, w = H // geom.npart // 8, W // 8
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)

    for spec in args.configs:
        # one config failing (e.g. a Pallas kernel rejected by the Mosaic
        # compiler on real hardware) must not kill the remaining configs:
        # every row of the A/B that CAN be measured should be.
        try:
            parts = spec.split(":")
            wm, nch, L = parts[0], int(parts[1]), int(parts[2])
            pad = parts[3] if len(parts) > 3 else "gather"
            B = args.batch
            codec = ScanWavefrontCodec(cfg, geom, h, w, batch=B, lanes=L,
                                       conv_chunks=nch, window_mode=wm,
                                       pad_mode=pad)
            codec.prepare(params["ent"])
            teacher = jnp.zeros((B, codec.P), jnp.int32)
            zwords = jnp.zeros((B * codec.NW,), jnp.uint32)
            zoff = jnp.zeros((B, L), jnp.int32)
            znb = jnp.zeros((B, L), jnp.uint32)
            for dec in (False, True):
                out = codec._run(zwords, zoff, znb, teacher, decode=dec)
                jax.block_until_ready(out)
                ts = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    out = codec._run(zwords, zoff, znb, teacher, decode=dec)
                    jax.block_until_ready(out)
                    ts.append(time.perf_counter() - t0)
                dt = min(ts)
                print(f"{spec} B={B} decode={int(dec)}: {dt:7.2f}s  "
                      f"{dt / codec.nsteps * 1e3:6.2f} ms/step  "
                      f"({dt / codec.nsteps / B * 1e3:6.2f} ms/step/img)",
                      flush=True)
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            print(f"{spec} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
