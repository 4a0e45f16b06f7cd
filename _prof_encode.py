import time, jax, jax.numpy as jnp, numpy as np
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig, cmpnet_init, cmpnet_encode_latents
from pseudocylindrical_convolution_tpu.models.entropy import entropy_net_raw
from pseudocylindrical_convolution_tpu.models.transform import encoder_apply
from pseudocylindrical_convolution_tpu.ops.slice import sphere_slice
from pseudocylindrical_convolution_tpu.ops.pad import pseudo_pad

cfg = CMPNetConfig(valid_dim=192, channels=192, code_channels=192, npart=16)
geom = cfg.geometry()
params = cmpnet_init(jax.random.PRNGKey(0), cfg)
x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 512, 1024), jnp.float32)

def bench(name, fn, *args):
    f = jax.jit(fn)
    t0=time.perf_counter(); r = f(*args); jax.block_until_ready(r)
    compile_t = time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(3): r = f(*args)
    jax.block_until_ready(r)
    print(f"{name}: compile {compile_t:.1f}s run {(time.perf_counter()-t0)/3*1000:.1f}ms")
    return r

tiles = bench("slice", lambda x: sphere_slice(x, geom), x)
bench("pad(3ch,1024)", lambda t: pseudo_pad(t, geom, 1), tiles)
t192 = jnp.zeros((16,192,32,1024))
bench("pad(192ch,1024)", lambda t: pseudo_pad(t, geom, 1), t192)
t192b = jnp.zeros((16,192,8,256))
bench("pad(192ch,256)", lambda t: pseudo_pad(t, geom, 1), t192b)
code = bench("encoder", lambda t: encoder_apply(params["encoder"], t, geom), tiles)
h = bench("latents(full)", lambda x: cmpnet_encode_latents(params, x, cfg, geom), x)
bench("entnet", lambda h: entropy_net_raw(params["ent"], h-3.5, geom, cfg.ngroup), h)
