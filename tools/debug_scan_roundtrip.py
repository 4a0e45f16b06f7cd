"""Diagnose a scan-codec round-trip mismatch: locate the first divergence
and classify it (AC decode bug vs CDF-table divergence).

The decode pass returns BOTH the symbol plane and the packed (low|high-1)
ranges its tables produced. If tables are identical to the encoder's, the
first packed mismatch must come at/after the first symbol mismatch (symbols
feed the next step's tables); if packed diverges at an index where all
previous symbols matched, the network itself produced different tables
for identical inputs -> numeric nondeterminism, not an AC bug.

Usage: python tools/debug_scan_roundtrip.py [--vd 192] [--hw 512 1024]
       [--lanes 64] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vd", type=int, default=192)
    ap.add_argument("--hw", type=int, nargs=2, default=(512, 1024))
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
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
    codec = ScanWavefrontCodec(cfg, geom, h, w, batch=1, lanes=args.lanes)
    codec.prepare(params["ent"])
    print(f"nsteps={codec.nsteps} nsym={codec.nsym} R={codec.R}")

    rng = np.random.default_rng(0)
    planes = rng.integers(0, 8, (1, geom.npart, cfg.ngroup, h, w),
                          dtype=np.int64).astype(np.int32)
    hind = np.asarray(geom.hindex(h * geom.npart, w))
    valid = np.arange(w)[None, :] < hind[:, None]
    planes = planes * valid[None, :, None, None, :]
    teacher = jnp.asarray(planes.reshape(1, codec.P).astype(np.int32))

    # encode pass: packed ranges
    B, L, NW = codec.B, codec.L, codec.NW
    zwords = jnp.zeros((B * NW,), jnp.uint32)
    zoff = jnp.zeros((B, L), jnp.int32)
    znb = jnp.zeros((B, L), jnp.uint32)
    plane_e, packed_e = codec._run(zwords, zoff, znb, teacher, decode=False)
    plane_e, packed_e = np.asarray(plane_e), np.asarray(packed_e)
    assert np.array_equal(plane_e.reshape(planes.shape), planes), \
        "encode-mode out_plane != teacher (scatter bug)"

    # re-run encode: determinism check
    _, packed_e2 = codec._run(zwords, zoff, znb, teacher, decode=False)
    packed_e2 = np.asarray(packed_e2)
    det = np.array_equal(packed_e, packed_e2)
    print("encode rerun deterministic:", det)
    if not det:
        bad = np.flatnonzero(packed_e[0] != packed_e2[0])
        print("  first nondet packed idx:", bad[:5], "of", len(bad))

    from pseudocylindrical_convolution_tpu.codec.coder_bridge import (
        encode_lanes)
    payload, lane_nbytes = encode_lanes(
        packed_e[0][codec.lane_perm], codec.lane_sym_off.astype(np.int64),
        65536)

    # decode pass
    plane_d, packed_d = None, None
    words = np.zeros((B, NW), np.uint32)
    nbits = np.zeros((B, L), np.uint32)
    lane_nbytes = np.asarray(lane_nbytes, np.int64)
    pos = 0
    for l in range(L):
        nb = int(lane_nbytes[l])
        lane = np.frombuffer(payload, np.uint8, count=nb, offset=pos)
        pos += nb
        wb = np.zeros(((nb + 3) // 4) * 4, np.uint8)
        wb[:nb] = lane
        w32 = wb.reshape(-1, 4).astype(np.uint32)
        off = int(codec.word_off_1[l])
        words[0, off:off + w32.shape[0]] = (
            (w32[:, 0] << 24) | (w32[:, 1] << 16) | (w32[:, 2] << 8)
            | w32[:, 3])
        nbits[0, l] = nb * 8
    word_off = codec.word_off_1[None, :].astype(np.int32)
    plane_d, packed_d = codec._run(
        jnp.asarray(words.reshape(-1)), jnp.asarray(word_off),
        jnp.asarray(nbits), jnp.zeros_like(teacher), decode=True)
    plane_d, packed_d = np.asarray(plane_d), np.asarray(packed_d)

    # locate first divergences in coding order (m index)
    sym_true = np.zeros(codec.nsym, np.int32)
    sym_dec = np.zeros(codec.nsym, np.int32)
    # m-th coded symbol lives at plane index xs_plane[z, i]
    flat_true = np.concatenate([planes.reshape(-1), [0]])
    flat_dec = np.concatenate([plane_d.reshape(-1), [0]])
    for z in range(codec.nsteps):
        n, o = int(codec.counts[z]), int(codec.offsets[z])
        sel = codec.xs_plane[z, :n]
        sym_true[o:o + n] = flat_true[sel]
        sym_dec[o:o + n] = flat_dec[sel]
    sym_bad = np.flatnonzero(sym_true != sym_dec)
    pk_bad = np.flatnonzero(packed_e[0] != packed_d[0])
    print(f"symbol mismatches: {len(sym_bad)}; packed mismatches: "
          f"{len(pk_bad)}")
    first_sym = sym_bad[0] if len(sym_bad) else None
    first_pk = pk_bad[0] if len(pk_bad) else None
    print("first symbol mismatch m =", first_sym,
          "; first packed mismatch m =", first_pk)

    def locate(m):
        z = int(np.searchsorted(codec.offsets, m, side="right") - 1)
        i = m - int(codec.offsets[z])
        return z, i, i % codec.L, i // codec.L

    if first_pk is not None and (first_sym is None or first_pk < first_sym):
        z, i, lane, rnd = locate(first_pk)
        print(f"TABLE DIVERGENCE first: step {z}, pos {i}, lane {lane}, "
              f"round {rnd}")
        print("  enc packed:", hex(int(packed_e[0][first_pk])),
              " dec packed:", hex(int(packed_d[0][first_pk])))
        lo_e = int(packed_e[0][first_pk]) & 0xFFFF
        hi_e = (int(packed_e[0][first_pk]) >> 16) + 1
        lo_d = int(packed_d[0][first_pk]) & 0xFFFF
        hi_d = (int(packed_d[0][first_pk]) >> 16) + 1
        print(f"  enc range [{lo_e},{hi_e})  dec range [{lo_d},{hi_d})")
    if first_sym is not None and (first_pk is None or first_sym <= first_pk):
        z, i, lane, rnd = locate(first_sym)
        print(f"AC DECODE DIVERGENCE first: step {z}, pos {i}, lane {lane}, "
              f"round {rnd}; true={sym_true[first_sym]} "
              f"dec={sym_dec[first_sym]}")


if __name__ == "__main__":
    main()
