import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"]="cpu"
    import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax
from pseudocylindrical_convolution_tpu.models.cmpnet import CMPNetConfig, cmpnet_init
from pseudocylindrical_convolution_tpu.codec.pipeline import (
    encode_image, decode_latents, _encode_tables)
cfg = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
geom = cfg.geometry(); params = cmpnet_init(jax.random.PRNGKey(0), cfg)
hs, fns = [], []
for i in range(3):
    x = jax.random.uniform(jax.random.PRNGKey(10+i), (1,3,64,128))
    fn = f"/tmp/bd_{i}.bin"; encode_image(params, x, cfg, geom, fn)
    _,_,h = _encode_tables(params, x, cfg, geom)
    hs.append(np.asarray(h)); fns.append(fn)
planes = decode_latents(params["ent"], cfg, geom, 2, 16, fns)
ok = all(np.array_equal(planes[i], hs[i].reshape(planes[i].shape)) for i in range(3))
print("batched decode bit-exact for all 3 streams:", ok)
assert ok
