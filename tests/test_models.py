import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pseudocylindrical_convolution_tpu.geometry import Geometry
from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_apply, cmpnet_init, cmpnet_encode_latents,
    cmpnet_decode_latents)
from pseudocylindrical_convolution_tpu.models.transform import (
    encoder_apply, encoder_init, decoder_apply, decoder_init)
from pseudocylindrical_convolution_tpu.ops.slice import sphere_slice

# Small config for fast CPU tests: 128x256 input, 8 bands, 16 channels.
CFG = CMPNetConfig(valid_dim=16, channels=16, code_channels=16, npart=8)
GEOM = CFG.geometry()


def test_encoder_decoder_shapes():
    key = jax.random.PRNGKey(0)
    pe = encoder_init(key, CFG.channels, CFG.code_channels)
    pd = decoder_init(key, CFG.channels, CFG.code_channels)
    x = jax.random.uniform(key, (1, 3, 128, 256))
    tiles = sphere_slice(x, GEOM)
    assert tiles.shape == (8, 3, 16, 256)
    code = encoder_apply(pe, tiles, GEOM)
    assert code.shape == (8, CFG.code_channels, 1, 16)
    rec = decoder_apply(pd, code, GEOM)
    assert rec.shape == (8, 3, 16, 256)
    # code is valid-region masked and in (0,1) after sigmoid
    c = np.asarray(code)
    hindex = GEOM.hindex(8, 16)
    for g in range(8):
        assert (c[g, :, :, hindex[g]:] == 0).all()
        assert (c[g, :, :, :hindex[g]] > 0).all()


def test_cmpnet_forward_and_grad():
    key = jax.random.PRNGKey(1)
    params = cmpnet_init(key, CFG)
    x = jax.random.uniform(key, (1, 3, 128, 256))

    def loss_fn(p):
        y, ent_vec, mask, hist = cmpnet_apply(p, x, CFG, GEOM)
        return (jnp.mean((y - x) ** 2)
                + jnp.sum(ent_vec) / jax.lax.stop_gradient(jnp.sum(mask)))

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    # all gradients finite
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # entropy grads nonzero
    g_ent = grads["ent"]["mean_net"]["net"]["0"]["conv"]["weight"]
    assert float(jnp.abs(g_ent).sum()) > 0


def test_latent_roundtrip():
    key = jax.random.PRNGKey(2)
    params = cmpnet_init(key, CFG)
    x = jax.random.uniform(key, (1, 3, 128, 256))
    h = cmpnet_encode_latents(params, x, CFG, GEOM)
    assert h.shape == (8, CFG.ngroup, 2, 32)
    sym = np.asarray(h)
    assert ((sym >= 0) & (sym <= 7)).all()
    assert sym == pytest.approx(np.round(sym))
    rec = cmpnet_decode_latents(params, h, CFG, GEOM)
    assert rec.shape == x.shape
