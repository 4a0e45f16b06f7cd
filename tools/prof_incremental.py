import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig, cmpnet_init
from pseudocylindrical_convolution_tpu.codec.incremental import WavefrontCodec
cfg = CMPNetConfig(valid_dim=192)
geom = cfg.geometry()
params = cmpnet_init(jax.random.PRNGKey(0), cfg)
wf = WavefrontCodec(cfg, geom, 4, 128)
wf.prepare(params["ent"])
bufs = wf.init_buffers()
ml = wf.maxlen
prev = (jnp.zeros((ml,), jnp.int32), jnp.zeros((ml,), jnp.int32), jnp.zeros((ml,), bool))
t0=time.perf_counter()
bufs, tb = wf._step(wf._weights, bufs, prev, 100)
jax.block_until_ready(tb)
print(f"compile: {time.perf_counter()-t0:.1f}s")
_ = np.asarray(tb)  # pay first-transfer if any remains
N=30
t0=time.perf_counter()
for i in range(N):
    bufs, tb = wf._step(wf._weights, bufs, prev, 100+i)
jax.block_until_ready(tb)
print(f"inc step device-only: {(time.perf_counter()-t0)/N*1000:.2f} ms")
t0=time.perf_counter()
for i in range(N):
    bufs, tb = wf._step(wf._weights, bufs, prev, 130+i)
    _ = np.asarray(tb)
dt=(time.perf_counter()-t0)/N
print(f"inc step + blocking transfer: {dt*1000:.2f} ms -> est decode/image {dt*wf.nsteps:.2f}s")
# encode timing (teacher forced, all async)
rng = np.random.RandomState(0)
plane = rng.randint(0,8,size=(16,cfg.ngroup,4,128)).astype(np.float32)
hindex = geom.hindex(64,128)
for g in range(16): plane[g,:,:,hindex[g]:]=0
t0=time.perf_counter()
size = wf.encode(plane, "/tmp/wf_enc.bin")
print(f"wavefront encode (first): {time.perf_counter()-t0:.2f}s {size}B")
t0=time.perf_counter()
size = wf.encode(plane, "/tmp/wf_enc.bin")
print(f"wavefront encode steady: {time.perf_counter()-t0:.2f}s")
t0=time.perf_counter()
dec = wf.decode("/tmp/wf_enc.bin")
print(f"wavefront decode: {time.perf_counter()-t0:.2f}s bit-exact: {np.array_equal(dec, plane)}")
