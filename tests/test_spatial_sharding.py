import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init, cmpnet_encode_latents)
from pseudocylindrical_convolution_tpu.parallel.spatial import (
    band_sharded_decode_halo, band_sharded_encode, band_sharded_encode_halo,
    make_band_mesh)

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


def test_halo_encode_decode_match_unsharded():
    """shard_map + explicit ppermute halo exchange must reproduce the
    single-device encode AND decode bit-exactly (the pad reads identical
    values through local tables; all arithmetic is unchanged)."""
    from pseudocylindrical_convolution_tpu.models.cmpnet import (
        cmpnet_decode_latents)
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 128, 256))
    ref_lat = np.asarray(cmpnet_encode_latents(params, x, CFG, GEOM))
    mesh = make_band_mesh(8)
    enc = band_sharded_encode_halo(params, CFG, GEOM, mesh)
    got_lat = np.asarray(enc(params, x))
    np.testing.assert_array_equal(got_lat, ref_lat)

    # the decode image is continuous: the local program convolves batch
    # nl=1 vs the reference's npart=8, so XLA's accumulation order differs
    # by float rounding (the latents above ARE bit-equal -- integers)
    ref_img = np.asarray(cmpnet_decode_latents(
        params, jax.numpy.asarray(ref_lat), CFG, GEOM))
    dec = band_sharded_decode_halo(params, CFG, GEOM, mesh)
    got_img = np.asarray(dec(params, jax.numpy.asarray(ref_lat)))
    np.testing.assert_allclose(got_img, ref_img, atol=2e-6, rtol=0)


def test_halo_encode_uneven_mesh():
    """npart=8 over 4 devices (2 bands per device) also matches."""
    params = cmpnet_init(jax.random.PRNGKey(2), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 128, 256))
    ref = np.asarray(cmpnet_encode_latents(params, x, CFG, GEOM))
    mesh = make_band_mesh(4)
    enc = band_sharded_encode_halo(params, CFG, GEOM, mesh)
    np.testing.assert_array_equal(np.asarray(enc(params, x)), ref)


def test_band_sharded_train_grads_match_unsharded():
    """Band-parallel value_and_grad of the full training loss must match
    the single-device parallel.train._loss_terms gradients (the halo
    exchange's adjoint is the reverse ppermute; everything else is the
    same arithmetic)."""
    from pseudocylindrical_convolution_tpu.parallel.spatial import (
        band_sharded_loss_grads)
    from pseudocylindrical_convolution_tpu.parallel.train import (
        LossWeights, _loss_terms)

    params = cmpnet_init(jax.random.PRNGKey(2), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 3, 128, 256))
    lw = LossWeights(gamma=1.0, beta=0.0, alpha=1.0, viewport_size=17)

    (ref_loss, ref_aux), ref_grads = jax.value_and_grad(
        _loss_terms, has_aux=True)(params, x, CFG, GEOM, lw)

    mesh = make_band_mesh(8)
    fn = band_sharded_loss_grads(CFG, GEOM, lw, mesh)
    (loss, aux), grads = fn(params, x)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aux[3]), np.asarray(ref_aux[3]))
    flat_r, _ = jax.flatten_util.ravel_pytree(ref_grads)
    flat_g, _ = jax.flatten_util.ravel_pytree(grads)
    # psum reduction order differs from the single-device sum: float32
    # noise up to ~1e-6 absolute on near-zero elements is expected
    np.testing.assert_allclose(np.asarray(flat_g), np.asarray(flat_r),
                               rtol=2e-5, atol=3e-6)
