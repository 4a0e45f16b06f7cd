"""End-to-end training smoke: a few steps on synthetic data must reduce the
loss through both alternating phases, exercise the quantizer maintenance
path, and keep all state finite (the reference's de-facto sanity check is
model_zoo_v2.py:404-417's forward/backward loop)."""

import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.parallel.train import (
    LossWeights, create_train_state, make_train_step)

CFG = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
GEOM = CFG.geometry()
LW = LossWeights(viewport_size=17, alpha=0.01)


def test_losses_decrease_over_steps():
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    state, tx_o, tx_e = create_train_state(params, CFG, lr=1e-3)
    step = jax.jit(
        make_train_step(CFG, GEOM, LW, tx_o, tx_e, acc_batch=1,
                        check_iters=3), static_argnums=2)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.rand(1, 2, 3, 64, 128).astype(np.float32))
    losses = []
    for i in range(6):
        train_ent = i % 2 == 0
        state, metrics = step(state, batch, train_ent)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    # training on a fixed batch must make progress
    assert losses[-1] < losses[0], losses
    # quantizer maintenance ran (step counter crossed check_iters=3) and the
    # count decay was applied at least once
    assert int(state.step) == 6
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
