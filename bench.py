"""Headline benchmark: full-image encode throughput on one TPU chip.

Flagship config (valid_dim=192, 512x1024 ERP). Encode = sphere slice +
EncoderV2 + quantizer + dense causal entropy network + device CDF tables +
host arithmetic coder (the complete pseudo_codec.py --enc pipeline).

Prints ONE JSON line. vs_baseline is measured against an estimated CUDA
reference encode throughput of 0.15 MP/s: the reference encoder steps the
wavefront 238 times per image with ~13 kernel launches and a host coder sync
per step (pseudo_codec.py:97-114), which bounds it to seconds per 0.52 MP
image on the GPUs it shipped for; no published numbers exist (BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REF_ENCODE_MPS = 0.15  # estimated CUDA reference throughput (see docstring)


def main():
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        CMPNetConfig, cmpnet_init)
    from pseudocylindrical_convolution_tpu.codec.pipeline import (
        encode_image, encode_images)

    cfg = CMPNetConfig(valid_dim=192, channels=192, code_channels=192,
                       npart=16, transform_dtype="bfloat16")
    geom = cfg.geometry()
    params = cmpnet_init(jax.random.PRNGKey(0), cfg)
    H, W = 512, 1024
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, H, W), jnp.float32)

    # warmup: compile AND pay the tunnel's one-time first-transfer cost
    encode_image(params, x, cfg, geom, "/tmp/bench_warm.bin")
    os.remove("/tmp/bench_warm.bin")

    iters = 8
    images = [jax.random.uniform(jax.random.PRNGKey(i), (1, 3, H, W),
                                 jnp.float32) for i in range(iters)]
    for im in images:
        jax.block_until_ready(im)
    t0 = time.perf_counter()
    sizes = encode_images(params, images, cfg, geom,
                          [f"/tmp/bench_code_{i}.bin" for i in range(iters)])
    total_bytes = sum(sizes)
    dt = time.perf_counter() - t0

    mp = H * W / 1e6
    mps = mp * iters / dt
    for i in range(iters):
        os.remove(f"/tmp/bench_code_{i}.bin")
    print(json.dumps({
        "metric": "encode_throughput_512x1024",
        "value": round(mps, 4),
        "unit": "MP/s",
        "vs_baseline": round(mps / REF_ENCODE_MPS, 2),
    }))


if __name__ == "__main__":
    main()
