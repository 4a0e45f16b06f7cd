"""Headline benchmark: full-image encode+decode throughput on one TPU chip.

Flagship config (valid_dim=192, 512x1024 ERP). Two codec modes are timed:

  * dense encode -- sphere slice + EncoderV2 + quantizer + ONE dense causal
    entropy pass for all CDF tables + host arithmetic coder (the complete
    pseudo_codec.py --enc pipeline, parallelized the TPU way).
  * scan codec  -- the single-program wavefront codec (codec/
    wavefront_scan.py): encode teacher-forces the same executable the
    decoder runs, decode runs the whole sequential wavefront + on-device
    arithmetic decoder in ONE dispatch. This is the only mode with a
    structural encoder==decoder bit-exactness guarantee, so the headline
    combined number uses scan encode + scan decode.

Headline value = N * megapixels / (t_scan_encode + t_scan_decode) -- the
BASELINE.md metric is encode+decode MP/s per chip.

vs_baseline derivation (the reference publishes no numbers; full component
accounting in BASELINE.md "Reference throughput derivation"): the
reference's entropy network costs a MEASURED 289.8 GFLOP per direction
(XLA cost analysis of the identical dense math) across 238 sequential
steps feeding a CPU arithmetic coder whose floor we MEASURED at
37.4/49.6 ms per direction (our buffer-backed coder, a strict lower bound
on the reference's fstream one). At a realistic 3% fp32 MFU for the
reference's one-block-per-element kernel on ragged diagonal slabs
(sm_75 peak 13.45 TFLOP/s) plus dispatch + AC, a direction costs
~0.8 s (~4 ms/step) -> REF_CODEC_MPS = 0.26 combined. The HARD bound
(100% MFU + launch/sync floors + measured AC; unreachable) is
REF_UPPER_MPS = 4.7 combined / 14 encode; vs_ref_upper_bound reports the
guaranteed multiple against it.

Prints ONE JSON line.
"""

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF_CODEC_MPS = 0.26       # realistic estimate (3% MFU), see BASELINE.md
REF_UPPER_MPS = 4.7        # hard bound: 100% MFU + launch/AC floors
REF_ENC_UPPER_MPS = 14.0   # encode-direction hard bound


def _preflight(timeout_s: int = 360):
    """Probe the device in a killable subprocess before committing to the
    full bench. The axon tunnel can be down (observed: a launcher-side
    relay outage mid-session); without this, backend init hangs ~25 min
    in retries and the driver records a timeout instead of a diagnosable
    artifact. Returns an error string, or None when healthy."""
    code = ("import jax, jax.numpy as jnp; "
            "(jnp.ones((8, 8)) * 2).block_until_ready(); print('DEVICE_OK')")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
        if r.returncode == 0 and "DEVICE_OK" in r.stdout:
            return None
        return (f"device preflight failed rc={r.returncode}: "
                f"{(r.stderr or r.stdout)[-300:]}")
    except subprocess.TimeoutExpired:
        return (f"device preflight timed out after {timeout_s}s "
                "(TPU tunnel down?)")


class _SectionTimeout(Exception):
    pass


def main():
    err = _preflight()
    if err is not None:
        print(json.dumps({
            "metric": "codec_throughput_512x1024_encdec",
            "value": 0.0, "unit": "MP/s", "vs_baseline": 0.0,
            "error": err,
        }))
        return
    # the dense-encode path drains the host AC coder and the scan codec
    # packs streams on the host: concurrent CPU load (e.g. a test suite)
    # contaminates every number. Warn loudly rather than publish junk.
    load1 = os.getloadavg()[0]
    if load1 > 4.0:
        print(f"WARNING: host 1-min load average {load1:.1f} -- bench "
              "numbers will be depressed by CPU contention; run alone",
              file=sys.stderr)

    import jax
    import jax.numpy as jnp
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec.pipeline import encode_images
    from pseudocylindrical_convolution_tpu.codec.wavefront_scan import (
        scan_decode_images, scan_encode_images)

    cfg = CMPNetConfig(valid_dim=192, channels=192, code_channels=192,
                       npart=16, transform_dtype="bfloat16")
    geom = cfg.geometry()
    # run the flagship TRAINED checkpoint when installed so bpp/throughput
    # correspond to a real operating point; random init is the fallback
    # (throughput is identical, bpp is not meaningful)
    flagship = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "demo", "mse", "10_192.pkl")
    weights_src = "random_init"
    if os.path.exists(flagship):
        from pseudocylindrical_convolution_tpu.utils.checkpoint import (
            load_params)
        params = load_params(flagship)
        weights_src = "demo/mse/10_192.pkl"
    else:
        params = cmpnet_init(jax.random.PRNGKey(0), cfg)
    H, W = 512, 1024
    mp = H * W / 1e6
    iters = 8
    images = [jax.random.uniform(jax.random.PRNGKey(i), (1, 3, H, W),
                                 jnp.float32) for i in range(iters)]
    for im in images:
        jax.block_until_ready(im)
    fns = [f"/tmp/bench_code_{i}.bin" for i in range(iters)]

    # ---- dense encode (fastest encode path) ----
    encode_images(params, images[:1], cfg, geom, ["/tmp/bench_warm.bin"])
    os.remove("/tmp/bench_warm.bin")
    t0 = time.perf_counter()
    encode_images(params, images, cfg, geom, fns)
    t_dense = time.perf_counter() - t0
    dense_mps = mp * iters / t_dense
    for fn in fns:
        os.remove(fn)

    # ---- scan codec: encode then decode (structural bit-exactness) ----
    # batch=1 measured fastest per image (the scan step is compute-bound);
    # chunks pipeline: device chunk k+1 overlaps host AC packing of chunk k
    batch = 1
    scan_encode_images(params, images[:1], cfg, geom, ["/tmp/bench_warm.bin"],
                       batch=batch)                      # compile + warm
    t0 = time.perf_counter()
    scan_encode_images(params, images, cfg, geom, fns, batch=batch)
    t_enc = time.perf_counter() - t0
    os.remove("/tmp/bench_warm.bin")

    # pixel_fmt u8 = the CLI --dec configuration (images convert to 8-bit
    # on device; the tunnel moves ~20 MB/s D2H so float pulls are material)
    recs = scan_decode_images(params, cfg, geom, fns[:1], (H, W),
                              pixel_fmt="u8")                  # compile
    t0 = time.perf_counter()
    recs = scan_decode_images(params, cfg, geom, fns, (H, W), pixel_fmt="u8")
    t_dec = time.perf_counter() - t0
    assert recs.shape[0] == iters
    total_bytes = sum(os.path.getsize(fn) for fn in fns)
    for fn in fns:
        os.remove(fn)

    enc_mps = mp * iters / t_enc
    dec_mps = mp * iters / t_dec
    combined = mp * iters / (t_enc + t_dec)

    # ---- MFU of the dense encode path (XLA cost analysis over the two
    # jitted programs the encode pipeline dispatches) ----
    extra = {}
    try:
        from pseudocylindrical_convolution_tpu.codec.pipeline import (
            _encode_latents_plane, _table_program)
        import jax.numpy as _jnp
        f1 = jax.jit(lambda p, x: _encode_latents_plane(p, x, cfg, geom))
        hcode, plane, _ = f1(params, images[0])
        c1 = f1.lower(params, images[0]).compile().cost_analysis() or {}
        c2 = (jax.jit(lambda p, pl: _table_program(p, pl, cfg, geom))
              .lower(params["ent"], plane.astype(_jnp.float32))
              .compile().cost_analysis() or {})
        flops = float(c1.get("flops", 0.0)) + float(c2.get("flops", 0.0))
        peak = 394e12   # v5e bf16 peak FLOP/s
        if flops > 0:
            extra["dense_encode_mfu"] = round(
                flops * iters / t_dense / peak, 4)
            extra["dense_encode_gflops_per_image"] = round(flops / 1e9, 1)
    except Exception:
        pass

    if not os.environ.get("BENCH_SKIP_HIGHRES"):
        # BASELINE config 4: 2048x4096 (814 wavefront steps), single image.
        # Budgeted: a cold compile of the high-res scan programs can exceed
        # the driver's patience on a fresh machine (no persistent cache
        # yet); on timeout the headline numbers above are still emitted.
        budget = int(os.environ.get("BENCH_HIGHRES_BUDGET", "2400"))

        def _on_alarm(signum, frame):
            raise _SectionTimeout()

        old = signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(budget)
        try:
            Hh, Wh = 2048, 4096
            xh = jax.random.uniform(jax.random.PRNGKey(99), (1, 3, Hh, Wh),
                                    jnp.float32)
            jax.block_until_ready(xh)
            fn = "/tmp/bench_hr.bin"
            scan_encode_images(params, [xh], cfg, geom, [fn], batch=1)  # warm
            t0 = time.perf_counter()
            scan_encode_images(params, [xh], cfg, geom, [fn], batch=1)
            t_he = time.perf_counter() - t0
            scan_decode_images(params, cfg, geom, [fn], (Hh, Wh),
                               pixel_fmt="u8")                          # warm
            t0 = time.perf_counter()
            scan_decode_images(params, cfg, geom, [fn], (Hh, Wh),
                               pixel_fmt="u8")
            t_hd = time.perf_counter() - t0
            os.remove(fn)
            mph = Hh * Wh / 1e6
            extra.update({"highres_encode_mps": round(mph / t_he, 4),
                          "highres_decode_mps": round(mph / t_hd, 4),
                          "highres_combined_mps": round(mph / (t_he + t_hd),
                                                        4)})
        except _SectionTimeout:
            extra["highres_skipped"] = f"budget {budget}s exceeded"
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, old)

    print(json.dumps({
        "metric": "codec_throughput_512x1024_encdec",
        "value": round(combined, 4),
        "unit": "MP/s",
        "vs_baseline": round(combined / REF_CODEC_MPS, 2),
        "scan_encode_mps": round(enc_mps, 4),
        "scan_decode_mps": round(dec_mps, 4),
        "dense_encode_mps": round(dense_mps, 4),
        # BASELINE.json north star: ">=5x encode megapixels/s on a single
        # v5e chip" vs the CUDA reference; ref encode runs the same
        # 238-step wavefront loop as decode (~0.52 MP/s at the generous
        # 4 ms/step estimate), so the target is 2.6 MP/s
        "northstar_encode_5x_met": bool(dense_mps >= 5 * (2 * REF_CODEC_MPS)),
        "northstar_scan_encode_5x_met": bool(enc_mps >= 5 * (2 * REF_CODEC_MPS)),
        "encode_vs_ref": round(dense_mps / (REF_CODEC_MPS * 2), 2),
        # guaranteed multiples against the reference's unreachable hard
        # bound (100% MFU + launch/sync floors + measured AC; BASELINE.md)
        "vs_ref_upper_bound": round(combined / REF_UPPER_MPS, 3),
        "encode_vs_ref_upper_bound": round(dense_mps / REF_ENC_UPPER_MPS, 3),
        "bpp": round(total_bytes * 8 / (H * W) / iters, 4),
        "weights": weights_src,
        **extra,
    }))


if __name__ == "__main__":
    main()
