"""Multi-process (multi-host/DCN analogue) data-parallel worker.

Run by tests/test_multihost.py: N processes x 2 CPU devices each form one
global mesh via jax.distributed.initialize (gRPC coordination + gloo
collectives -- the CPU stand-in for a TPU pod's DCN). Each process computes
gradients on its addressable shards; the pmean must equal the single-process
oracle on the concatenated batch (DDP allreduce semantics across HOSTS, not
just local devices -- the axis the reference never exercises,
trainDDP_Full.py:83-86 is single-node).

Usage: dcn_worker.py <process_id> <num_processes> <port>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, "/root/repo")
from pseudocylindrical_convolution_tpu.models.cmpnet import (  # noqa: E402
    CMPNetConfig, cmpnet_init)
from pseudocylindrical_convolution_tpu.parallel.train import (  # noqa: E402
    LossWeights, _loss_terms)

CFG = CMPNetConfig(valid_dim=8, channels=8, code_channels=8, npart=4)
GEOM = CFG.geometry()
LW = LossWeights(viewport_size=17)

ndev = len(jax.devices())
assert ndev == 2 * nproc, (ndev, nproc)
assert jax.process_count() == nproc
mesh = Mesh(np.array(jax.devices()), ("data",))

params = cmpnet_init(jax.random.PRNGKey(0), CFG)
batch_np = np.asarray(
    jax.random.uniform(jax.random.PRNGKey(3), (ndev, 3, 64, 128)))

# global batch: each process contributes only its addressable shards
bsh = NamedSharding(mesh, P("data"))
batch = jax.make_array_from_callback(batch_np.shape, bsh,
                                     lambda idx: batch_np[idx])
# params replicated across all hosts
params = jax.device_put(params, NamedSharding(mesh, P()))


def gradme(p, xb):
    (loss, _), g = jax.value_and_grad(_loss_terms, has_aux=True)(
        p, xb, CFG, GEOM, LW)
    return loss, g


def shard_body(p, xb):
    loss, g = gradme(p, xb)
    return (jax.lax.pmean(loss, "data"),
            jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g))


loss_m, g_m = jax.jit(jax.shard_map(
    shard_body, mesh=mesh, in_specs=(P(), P("data")), out_specs=(P(), P()),
    check_vma=False))(params, batch)

# single-process oracle on the full concatenated batch (local device 0)
with jax.default_device(jax.local_devices()[0]):
    params_l = cmpnet_init(jax.random.PRNGKey(0), CFG)
    loss_1, g_1 = jax.jit(gradme)(params_l, batch_np)

loss_m = float(jax.device_get(loss_m))
loss_1 = float(loss_1)
assert abs(loss_m - loss_1) < 1e-5 * max(1.0, abs(loss_1)), (loss_m, loss_1)
flat_m = jax.tree_util.tree_leaves(jax.device_get(g_m))
flat_1 = jax.tree_util.tree_leaves(jax.device_get(g_1))
for a, b in zip(flat_m, flat_1):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=1e-6)
print(f"DCN_OK pid={pid} nproc={nproc} loss={loss_m:.6f}", flush=True)
