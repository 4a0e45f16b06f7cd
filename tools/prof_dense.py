"""Profile the dense encode path by section: transform+quant vs dense
causal table program vs host packing/AC.

Usage: python tools/prof_dense.py [--vd 192] [--iters 4] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vd", type=int, default=192)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        _encode_latents_plane, _table_program, encode_images)

    print("devices:", jax.devices())
    cfg = CMPNetConfig(valid_dim=args.vd, channels=192, code_channels=192,
                       npart=16, transform_dtype="bfloat16")
    geom = cfg.geometry()
    H, W = args.hw
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, H, W), jnp.float32)

    f1 = jax.jit(lambda p, x: _encode_latents_plane(p, x, cfg, geom))
    f2 = jax.jit(lambda p, pl: _table_program(p, pl, cfg, geom))

    def timeit(name, fn, *a, flops=None):
        o = fn(*a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = fn(*a)
            jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / args.iters
        msg = f"{name:>14}: {dt*1e3:8.2f} ms"
        if flops:
            msg += f"  ({flops/dt/1e12:5.1f} TF/s, {flops/dt/394e12:5.1%} MFU)"
        print(msg)
        return dt, o

    c1 = f1.lower(params, x).compile().cost_analysis() or {}
    _, (hcode, plane, syms) = timeit("latents", f1, params, x,
                                     flops=float(c1.get("flops", 0)))
    pl = plane.astype(jnp.float32)
    c2 = f2.lower(params["ent"], pl).compile().cost_analysis() or {}
    timeit("tables", f2, params["ent"], pl,
           flops=float(c2.get("flops", 0)))

    fn = "/tmp/prof_dense.bin"
    encode_images(params, [x], cfg, geom, [fn])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        encode_images(params, [x], cfg, geom, [fn])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{'full encode':>14}: {dt*1e3:8.2f} ms  "
          f"({H*W/1e6/dt:.2f} MP/s single-image)")
    os.remove(fn)


if __name__ == "__main__":
    main()
