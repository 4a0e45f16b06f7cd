"""Profile the single-program scan codec at flagship scale on the real chip.

Usage: python tools/prof_scan.py [--batch 1] [--lanes 64] [--vd 192]
       [--iters 3] [--with-dense]

Measures the scan program (teacher-forced encode pass and decode pass),
host AC lane encode, and optionally the dense one-shot encode for context.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--vd", type=int, default=192)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--with-dense", action="store_true")
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        ScanWavefrontCodec)

    print("devices:", jax.devices())
    cfg = CMPNetConfig(valid_dim=args.vd, channels=192, code_channels=192,
                       npart=16, transform_dtype="bfloat16")
    geom = cfg.geometry()
    H, W = args.hw
    h = H // geom.npart // 8
    w = W // 8
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)

    t0 = time.perf_counter()
    codec = ScanWavefrontCodec(cfg, geom, h, w, batch=args.batch,
                               lanes=args.lanes)
    codec.prepare(params["ent"])
    print(f"codec built in {time.perf_counter()-t0:.1f}s; nsteps="
          f"{codec.nsteps} nsym={codec.nsym} R={codec.R} maxlen~"
          f"{int(codec.counts.max())}")

    rng = np.random.default_rng(0)
    planes = rng.integers(0, 8, (args.batch, geom.npart, cfg.ngroup, h, w),
                          dtype=np.int64).astype(np.int32)
    # zero the never-coded region (columns past each band's valid width);
    # the real pipeline's pseudo_fill guarantees zeros there, and the codec
    # only round-trips coded positions
    hind = np.asarray(geom.hindex(h * geom.npart, w))
    col = np.arange(w)
    valid = col[None, :] < hind[:, None]                  # (npart, w)
    planes = planes * valid[None, :, None, None, :]

    # ---- encode (compile + warm the tunnel) ----
    t0 = time.perf_counter()
    streams = codec.encode_planes(planes)
    print(f"encode pass 1 (compile+warmup): {time.perf_counter()-t0:.1f}s; "
          f"bytes={len(streams[0][0])}")

    for it in range(args.iters):
        t0 = time.perf_counter()
        streams = codec.encode_planes(planes)
        dt = time.perf_counter() - t0
        mp = H * W * args.batch / 1e6
        print(f"encode iter {it}: {dt*1e3:.0f} ms "
              f"({dt/codec.nsteps*1e3:.2f} ms/step, {mp/dt:.3f} MP/s)")

    # ---- decode ----
    t0 = time.perf_counter()
    out = codec.decode_streams(streams)
    print(f"decode pass 1 (compile): {time.perf_counter()-t0:.1f}s")
    assert np.array_equal(out, planes), "round-trip mismatch!"
    print("round-trip bit-exact")

    for it in range(args.iters):
        t0 = time.perf_counter()
        out = codec.decode_streams(streams)
        dt = time.perf_counter() - t0
        mp = H * W * args.batch / 1e6
        print(f"decode iter {it}: {dt*1e3:.0f} ms "
              f"({dt/codec.nsteps*1e3:.2f} ms/step, {mp/dt:.3f} MP/s)")

    # ---- device-only program time (no host AC / transfers) ----
    B, L = codec.B, codec.L
    words = jnp.zeros((B * codec.NW,), jnp.uint32)
    word_off = jnp.zeros((B, L), jnp.int32)
    nbits = jnp.zeros((B, L), jnp.uint32)
    teacher = jnp.asarray(planes.reshape(B, codec.P).astype(np.int32))
    o = codec._run(words, word_off, nbits, teacher, decode=False)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        o = codec._run(words, word_off, nbits, teacher, decode=False)
        jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / args.iters
    print(f"device program only: {dt*1e3:.0f} ms "
          f"({dt/codec.nsteps*1e3:.2f} ms/step)")

    if args.with_dense:
        from pseudocylindrical_convolution_tpu.codec.pipeline import (
            encode_image)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, H, W),
                               jnp.float32)
        encode_image(params, x, cfg, geom, "/tmp/prof_dense.bin")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            encode_image(params, x, cfg, geom, "/tmp/prof_dense.bin")
        dt = (time.perf_counter() - t0) / args.iters
        print(f"dense encode_image: {dt*1e3:.0f} ms "
              f"({H*W/1e6/dt:.3f} MP/s)")
        os.remove("/tmp/prof_dense.bin")


if __name__ == "__main__":
    main()
