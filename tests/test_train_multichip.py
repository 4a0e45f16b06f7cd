import jax
import jax.numpy as jnp
import numpy as np

from pseudocylindrical_convolution_tpu.models.cmpnet import (
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.parallel.mesh import (
    make_mesh, shard_train_step)
from pseudocylindrical_convolution_tpu.parallel.train import (
    LossWeights, create_train_state, make_train_step)

CFG = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
GEOM = CFG.geometry()
LW = LossWeights(viewport_size=17)


def _mk(axis_name=None):
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    state, tx_o, tx_e = create_train_state(params, CFG)
    step = make_train_step(CFG, GEOM, LW, tx_o, tx_e, acc_batch=2,
                           axis_name=axis_name)
    return state, step


def test_single_device_train_step_updates_params():
    state, step = _mk()
    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 3, 64, 128))
    new_state, metrics = jax.jit(step, static_argnums=2)(state, batch, True)
    assert np.isfinite(float(metrics["loss"]))
    # entropy params changed, encoder params unchanged in ent phase
    w0 = state.params["ent"]["mean_net"]["net"]["0"]["conv"]["weight"]
    w1 = new_state.params["ent"]["mean_net"]["net"]["0"]["conv"]["weight"]
    assert float(jnp.abs(w1 - w0).max()) > 0
    e0 = state.params["encoder"]["net"]["9"]["weight"]
    e1 = new_state.params["encoder"]["net"]["9"]["weight"]
    assert float(jnp.abs(e1 - e0).max()) == 0
    # quantizer usage counter accumulated
    assert float(jnp.abs(new_state.count).sum()) > 0
    assert int(new_state.step) == 1


def test_other_phase_updates_encoder():
    state, step = _mk()
    batch = jax.random.uniform(jax.random.PRNGKey(2), (2, 1, 3, 64, 128))
    new_state, _ = jax.jit(step, static_argnums=2)(state, batch, False)
    e0 = state.params["encoder"]["net"]["9"]["weight"]
    e1 = new_state.params["encoder"]["net"]["9"]["weight"]
    assert float(jnp.abs(e1 - e0).max()) > 0
    q0 = state.params["quant"]["weight"]
    q1 = new_state.params["quant"]["weight"]
    assert float(jnp.abs(q1 - q0).max()) > 0


def test_multichip_dp_matches_single_device():
    """8-device pmean'd gradients == single-device gradients on the
    concatenated batch (DDP allreduce semantics, trainDDP_Full.py:122-137).

    Each device grads the mean loss over its 1-image shard; pmean over the
    8 shards must equal the gradient of the mean loss over all 8 images on
    one device (the rate term sum(ent)/sum(mask) is a per-image mean too,
    because the mask sum is the same static geometry for every image)."""
    from jax.sharding import PartitionSpec as P
    from pseudocylindrical_convolution_tpu.parallel.train import _loss_terms

    n = 8
    mesh = make_mesh(n)
    params = cmpnet_init(jax.random.PRNGKey(0), CFG)
    batch = jax.random.uniform(jax.random.PRNGKey(3), (n, 3, 64, 128))

    def gradme(p, xb):
        (loss, _), g = jax.value_and_grad(_loss_terms, has_aux=True)(
            p, xb, CFG, GEOM, LW)
        return loss, g

    def shard_body(p, xb):
        loss, g = gradme(p, xb)
        return (jax.lax.pmean(loss, "data"),
                jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g))

    loss_m, g_m = jax.jit(jax.shard_map(
        shard_body, mesh=mesh, in_specs=(P(), P("data")),
        out_specs=(P(), P()), check_vma=False))(params, batch)
    loss_1, g_1 = jax.jit(gradme)(params, batch)

    assert abs(float(loss_m) - float(loss_1)) < 1e-5 * max(
        1.0, abs(float(loss_1)))
    flat_m, _ = jax.tree_util.tree_flatten(g_m)
    flat_1, treedef = jax.tree_util.tree_flatten(g_1)
    for a, b in zip(flat_m, flat_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_multichip_dp_step_metrics_match_single_device():
    """Full sharded train step vs the same step run on one device with the
    concatenated micro-batch: identical loss metrics (params then move by
    Adam on near-identical grads)."""
    n = 8
    mesh = make_mesh(n)
    state_m, step_m = _mk(axis_name="data")
    step_sharded = shard_train_step(step_m, mesh, train_ent=True)
    batch = jax.random.uniform(jax.random.PRNGKey(4), (2, n, 3, 64, 128))
    new_m, metrics_m = step_sharded(state_m, batch)

    state_1, step_1 = _mk(axis_name=None)
    new_1, metrics_1 = jax.jit(step_1, static_argnums=2)(state_1, batch, True)

    for k in ("loss", "mse", "rate"):
        assert abs(float(metrics_m[k]) - float(metrics_1[k])) < 2e-5 * max(
            1.0, abs(float(metrics_1[k]))), k
    # count side-channel: the usage histogram is mean-normalized per
    # element, so pmean over shards == whole-batch histogram directly
    np.testing.assert_allclose(np.asarray(new_m.count),
                               np.asarray(new_1.count), rtol=1e-4, atol=1e-7)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
