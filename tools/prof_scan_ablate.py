"""Ablate the scan-codec step to attribute per-step time.

Builds variants of the 238-step scan program with pieces knocked out and
times each on the current backend:

  full      : the real encode-mode program (teacher path; AC branch unused)
  noscatter : frontier convs but activations never scattered back
  nogather  : window gathers replaced by a zero slab (convs still run)
  noconv    : window gathered but conv replaced by a cheap slice
  acloop    : AC decode rounds only (real words), no network

Usage: python tools/prof_scan_ablate.py [--vd 192] [--iters 3]
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
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec import device_ac
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        ScanWavefrontCodec)

    print("devices:", jax.devices())
    cfg = CMPNetConfig(valid_dim=args.vd, channels=192, code_channels=192,
                       npart=16)
    geom = cfg.geometry()
    H, W = args.hw
    h, w = H // geom.npart // 8, W // 8
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)
    codec = ScanWavefrontCodec(cfg, geom, h, w, batch=args.batch,
                               lanes=args.lanes)
    codec.prepare(params["ent"])
    B, L, G = codec.B, codec.L, codec.G
    npart, S, P = codec.npart, codec.S, codec.P
    C = G * codec.cpn
    print(f"nsteps={codec.nsteps} R={codec.R}")

    teacher = jnp.zeros((B, P), jnp.int32)
    zwords = jnp.zeros((B * codec.NW,), jnp.uint32)
    zoff = jnp.zeros((B, L), jnp.int32)
    znb = jnp.zeros((B, L), jnp.uint32)

    def timeit(name, fn, *a):
        o = fn(*a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = fn(*a)
            jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:>10}: {dt*1e3:7.0f} ms  ({dt/codec.nsteps*1e3:6.2f} "
              f"ms/step)")
        return dt

    # ---- full encode-mode program ----
    timeit("full", lambda: codec._run(zwords, zoff, znb, teacher,
                                      decode=False))
    # ---- full decode-mode program (zero words; AC state machine still
    # steps every round, which is what costs) ----
    timeit("fulldec", lambda: codec._run(zwords, zoff, znb, teacher,
                                         decode=True))

    # ---- variants of the network-only scan (channel-last layout) ----
    def make_net_scan(use_deposit=True, use_conv=True):
        weights = codec._weights

        def prog():
            bufs = [jnp.zeros((B, S, G), codec.dtype)]
            for _ in range(11):                        # subnet-stacked
                bufs.append(jnp.zeros((B, S, 3 * C), codec.dtype))

            def deposit(buf, cells, z):
                if not use_deposit:
                    return buf + (1e-12 * jnp.sum(cells)).astype(buf.dtype)
                return codec._deposit(buf, cells, z)

            def fconv(buf, z, layer):
                if not use_conv:
                    win = codec._window(buf, z)        # (B, np, h+4, T, CC)
                    cout3 = layer["k"].shape[-1]
                    red = jnp.sum(win, axis=(2, 3)) * 1e-12   # (B, np, CC)
                    out = jnp.zeros((B, npart, h, cout3), jnp.float32)
                    return out + red[:, :, None, :1]
                return codec._frontier_conv(buf, z, layer)

            def body(carry, z):
                bufs = carry
                y0 = fconv(bufs[0], z, weights[0])
                bufs[1] = deposit(bufs[1], y0, z)
                ycells = y0
                for blk in range(5):
                    li = 1 + 2 * blk
                    c1 = fconv(bufs[1 + 2 * blk], z, weights[li])
                    bufs[2 + 2 * blk] = deposit(bufs[2 + 2 * blk], c1, z)
                    c2 = fconv(bufs[2 + 2 * blk], z, weights[li + 1])
                    ycells = ycells + c2
                    bufs[3 + 2 * blk] = deposit(bufs[3 + 2 * blk], ycells, z)
                out = fconv(bufs[11], z, weights[11])
                return bufs, jnp.sum(out)

            bufs, outs = jax.lax.scan(body, bufs,
                                      jnp.arange(codec.nsteps))
            return outs.sum()

        return jax.jit(prog)

    timeit("netonly", make_net_scan(True, True))
    timeit("nodeposit", make_net_scan(False, True))
    timeit("noconv", make_net_scan(True, False))

    # ---- AC rounds only ----
    R = codec.R
    xs_grid = jnp.asarray(codec.xs_grid)
    xs_valid = jnp.asarray(codec.xs_valid)

    def ac_prog(words, word_off, nbits):
        ac = device_ac.init_state(words, word_off, nbits)
        tbl = jnp.tile(jnp.asarray(
            np.linspace(0, 65536, 9, dtype=np.int64).astype(np.uint32)),
            (B, G * codec.h_out, 1))

        def body(ac, x):
            grid_sel, valid = x
            tot = jnp.uint32(0)
            for rr in range(R):
                sl = slice(rr * L, (rr + 1) * L)
                actB = jnp.broadcast_to(valid[sl][None], (B, L))
                cdf = tbl[:, grid_sel[sl]]
                ac, sy = device_ac.decode_symbols(ac, words, cdf, actB)
                tot += jnp.sum(sy.astype(jnp.uint32))
            return ac, tot

        ac, tots = jax.lax.scan(body, ac, (xs_grid, xs_valid))
        return tots.sum()

    # real-ish words: uniform tables so every lane decodes fine
    nwords = B * codec.NW
    rng = np.random.default_rng(0)
    words = jnp.asarray(rng.integers(0, 2**32, nwords, dtype=np.uint64)
                        .astype(np.uint32))
    word_off = jnp.asarray(codec.word_off_1[None, :].astype(np.int32))
    nbits = jnp.asarray((codec.lane_words_max[None, :] * 32)
                        .astype(np.uint32))
    timeit("acloop", jax.jit(ac_prog), words, word_off, nbits)


if __name__ == "__main__":
    main()
