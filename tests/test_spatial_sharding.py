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


def test_band_train_step_phase_semantics():
    """make_band_train_step must mirror make_train_step's contract: the
    entropy phase updates ONLY the entropy params, the other phase ONLY
    encoder/decoder/quant.weight, and the usage counter integrates the
    (band-psum'd) histogram with the SGD rule count -= lr * hist."""
    import jax.flatten_util
    from pseudocylindrical_convolution_tpu.parallel.spatial import (
        band_sharded_loss_grads, make_band_train_step)
    from pseudocylindrical_convolution_tpu.parallel.train import (
        LossWeights, create_train_state)

    params = cmpnet_init(jax.random.PRNGKey(4), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 128, 256))
    lw = LossWeights(viewport_size=17)
    mesh = make_band_mesh(8)
    state, tx_other, tx_ent = create_train_state(params, CFG)
    step = jax.jit(make_band_train_step(CFG, GEOM, lw, tx_other, tx_ent,
                                        mesh), static_argnums=2)

    (_, aux) = band_sharded_loss_grads(CFG, GEOM, lw, mesh)(params, x)[0]

    s1, m1 = step(state, x, True)          # entropy phase
    assert np.isfinite(float(m1["loss"]))
    np.testing.assert_array_equal(                      # other side frozen
        np.asarray(s1.params["encoder"]["in"]["w"])
        if "in" in s1.params["encoder"] else
        np.asarray(jax.tree_util.tree_leaves(s1.params["encoder"])[0]),
        np.asarray(jax.tree_util.tree_leaves(params["encoder"])[0]))
    ent_new = jax.flatten_util.ravel_pytree(s1.params["ent"])[0]
    ent_old = jax.flatten_util.ravel_pytree(params["ent"])[0]
    assert not np.array_equal(np.asarray(ent_new), np.asarray(ent_old))
    np.testing.assert_allclose(                         # exact SGD count
        np.asarray(s1.count),
        np.asarray(state.count) - 1e-3 * np.asarray(aux[3]), rtol=1e-6)

    s2, m2 = step(s1, x, False)            # encoder/decoder/quant phase
    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_array_equal(                      # ent side frozen
        np.asarray(jax.flatten_util.ravel_pytree(s2.params["ent"])[0]),
        np.asarray(ent_new))
    enc_new = jax.flatten_util.ravel_pytree(s2.params["encoder"])[0]
    enc_old = jax.flatten_util.ravel_pytree(s1.params["encoder"])[0]
    assert not np.array_equal(np.asarray(enc_new), np.asarray(enc_old))
    assert int(s2.step) == 2
