import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init, cmpnet_encode_latents)
from pseudocylindrical_convolution_tpu.parallel.spatial import (
    band_sharded_encode, make_band_mesh)

CFG = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=8)
GEOM = CFG.geometry()


def test_band_sharded_encode_matches_unsharded():
    """Latitude-band sharding over an 8-device mesh must reproduce the
    single-device latents (GSPMD halo collectives are exact)."""
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 128, 256))
    ref = np.asarray(cmpnet_encode_latents(params, x, CFG, GEOM))
    mesh = make_band_mesh(8)
    fn = band_sharded_encode(params, CFG, GEOM, mesh)
    got = np.asarray(fn(params, x))
    np.testing.assert_array_equal(got, ref)
