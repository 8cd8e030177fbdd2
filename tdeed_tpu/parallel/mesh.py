"""Device mesh + sharding helpers for data parallelism over ICI.

The reference is single-GPU (vestigial nn.DataParallel unwrapping only,
ref: model/modules.py:47-55); here data parallelism is first-class and
expressed through GSPMD: the batch is sharded over a 1-D 'data' mesh axis,
params/opt-state are replicated, and XLA inserts the gradient all-reduce
(psum over ICI) automatically because the jitted step's math is global.
Semantics are bit-comparable to single-device execution (BatchNorm included:
batch stats are means over the *global* batch), which tests verify on an
8-way fake CPU mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data", devices=None
) -> Mesh:
    """1-D data-parallel mesh. On multi-host platforms pass jax.devices()."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put a host batch with the leading axis sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_replica(tree: Any) -> Any:
    """Host-numpy copy of a (replicated) array tree, multi-host safe.

    ``jax.device_get`` refuses arrays whose shards live on other hosts'
    devices. Data-parallel state (params / BN stats / opt state) is
    REPLICATED over the global mesh, so the process-local replica is the
    full value — pull it via ``addressable_data``. Fully-addressable leaves
    (single-host) take the plain device_get path.
    """

    def pull(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            assert x.sharding.is_fully_replicated, (
                "host_replica needs replicated arrays; got sharding "
                f"{x.sharding} for shape {x.shape}"
            )
            return np.asarray(x.addressable_data(0))
        return jax.device_get(x)

    return jax.tree.map(pull, tree)


def make_sharded_predict(
    predict_step,
    mesh: Mesh,
    params: Any,
    batch_stats: Any,
    axis_name: str = "data",
):
    """DP-sharded inference closure over a local mesh.

    Shards each window batch's leading axis over the mesh and replicates
    params/BN stats once, so the jitted predict forward runs batch-parallel
    across all local devices (the reference evaluates on its single GPU,
    ref: util/eval.py:290-349; training here is already DP — this applies
    the same mesh to the eval/serving forward). Eval-mode rows are
    independent (BN running stats), so per-sample outputs are identical to
    the single-device program.

    predict_step(params, stats, frames, hflip) -> (argmax, probs), jitted.
    The batch size must be divisible by mesh.size (predict_windows pads
    ragged tails to the static batch size already).
    """
    rep = replicated(mesh)
    p = jax.device_put(params, rep)
    bs = jax.device_put(batch_stats, rep)
    sh = batch_sharding(mesh, axis_name)

    def fn(frames, hflip: bool = False):
        n = np.shape(frames)[0]
        if n % mesh.size:
            raise ValueError(
                f"batch {n} not divisible by the {mesh.size}-device mesh"
            )
        _, probs = predict_step(p, bs, jax.device_put(frames, sh), hflip)
        return probs

    return fn


def form_global_batch(local_batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Assemble a globally-sharded batch from per-host local shards.

    Multi-host DP: every host loads batch_size/process_count samples; this
    stitches them into global jax.Arrays sharded over the mesh's data axis
    (the multi-host equivalent of shard_batch, which assumes one process
    owns the full batch)."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch,
    )


def startup_barrier(tag: str = "tdeed:startup") -> None:
    """Establish the cross-process collective channels while every process
    is still in lockstep (call right after ``jax.distributed.initialize``).

    The first collective of a training run otherwise executes only after
    the full train-step compile, and compile wall-time can skew between
    processes by more than the transport's rendezvous window (XLA:CPU's
    Gloo key exchange has a hard 30 s timeout; the reference's NCCL
    equivalent is the NCCL_COMM_ID bootstrap, ref: torch.distributed
    init in /root/reference/train_tdeed.py's single-process design has no
    counterpart). Collective contexts are cached per device clique, so one
    tiny psum over every global device here lets all later collectives
    reuse the established channels regardless of skew. No-op with a single
    process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
