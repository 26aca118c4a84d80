"""Device mesh construction for TP/DP/EP/CP.

The single TPU-native replacement for the reference's entire process-group
stack — ParallelArgs rank math, CollectiveCommunicator group creation, and
NCCL/HCCL rendezvous (reference
xllm/core/framework/parallel_state/parallel_args.h:31-226,
collective_communicator.h:22-50, collective_service.cpp:43): one
``jax.sharding.Mesh`` with named axes; GSPMD inserts the collectives and
jax.distributed handles multi-host rendezvous.

Axis layout (SURVEY.md §2.6): ``data`` (attention-DP) x ``tp`` (tensor).
The expert axis aliases ``tp`` for MoE EP (moe_ep groups in the reference),
and the context axis aliases ``data`` for CP prefill — both refined in later
rounds once those code paths land.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from xllm_tpu.config import ParallelConfig

DATA_AXIS = "data"
CP_AXIS = "cp"
TP_AXIS = "tp"


def build_mesh(
    parallel: ParallelConfig, devices: list | None = None
) -> Mesh | None:
    """Build the (data, cp, tp) mesh; None for the trivial single-device
    case. The context axis shards prefill tokens (parallel/cp.py); decode
    keeps it trivial (reference cp_input_partition.h:44-48)."""
    if devices is None:
        devices = jax.devices()
    world = parallel.world_size
    if world == 1 and len(devices) == 1:
        return None
    if world > len(devices):
        raise ValueError(
            f"parallel config needs {world} devices, have {len(devices)}"
        )
    dev = np.array(devices[:world]).reshape(
        parallel.dp_size, parallel.cp_size, parallel.tp_size
    )
    return Mesh(dev, (DATA_AXIS, CP_AXIS, TP_AXIS))


def replicated(mesh: Mesh | None):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def make_named_shardings(mesh: Mesh | None, spec_tree):
    """PartitionSpec tree -> NamedSharding tree (or None tree w/o mesh)."""
    if mesh is None:
        return None
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
