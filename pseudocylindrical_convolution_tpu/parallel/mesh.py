"""Device mesh helpers and the sharded (SPMD) training step.

The reference's multi-GPU story is single-node DDP over NCCL
(trainDDP_Full.py:83-86). Here the equivalent is a ('data',) mesh: params
replicated, batch sharded over 'data', gradients pmean'd over ICI inside one
jitted program. Multi-host runs only additionally need
jax.distributed.initialize(); no rendezvous code.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_train_step(step_fn, mesh: Mesh, train_ent: bool, axis: str = "data"):
    """Wrap a train step (built with axis_name=axis) into an SPMD program.

    batch layout: (acc_batch, micro_batch, 3, H, W), sharded over micro_batch.
    """
    def call(state, batch):
        return step_fn(state, batch, train_ent)

    sharded = jax.shard_map(
        call, mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=(P(), P()),
        check_vma=False)
    # donate the train state: params + 3 optimizer states are the dominant
    # HBM residents at flagship size; in-place update halves their footprint
    return jax.jit(sharded, donate_argnums=(0,))
