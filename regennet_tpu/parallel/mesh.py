"""Device meshes and shardings — the distributed runtime (L4).

Replaces the reference's MPI + torch.distributed DDP stack
(reference: utils/dist_util.py:20-83, train/training_loop.py:115-124) with
the TPU-native single-program model: a `jax.sharding.Mesh` over ('data',
'model') axes, NamedShardings on params and batch, and XLA GSPMD inserting
the collectives (gradient psum over 'data', activation collectives over
'model') — no NCCL calls, no parameter broadcast, no explicit allreduce.

* data axis  — batch sharding == the reference's only parallelism (DP).
* model axis — optional tensor parallelism of the transformer: attention
  head projections and the first FF matmul are column-sharded, output
  projections row-sharded, everything else replicated. The reference has no
  TP (SURVEY.md §2.5); it's provided because on a TPU pod slice intra-layer
  sharding over ICI is the idiomatic way to scale a small-batch sampler.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameter name -> (kernel spec, bias spec): column-parallel then row-parallel
_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "linear1")
_ROW_PARALLEL = ("out_proj", "linear2")


def make_mesh(
    data: int = -1, model: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Create a ('data', 'model') mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    dev_array = mesh_utils.create_device_mesh(
        (data, model), devices=devices[: data * model]
    )
    return Mesh(dev_array, ("data", "model"))


def _spec_for_param(path: tuple, leaf) -> P:
    names = [str(getattr(k, "key", k)) for k in path]
    joined = "/".join(names)
    is_kernel = names[-1] == "kernel"
    is_bias = names[-1] == "bias"
    for col in _COL_PARALLEL:
        if col in joined:
            if is_kernel:
                return P(None, "model")
            if is_bias:
                return P("model")
    for row in _ROW_PARALLEL:
        if row in joined:
            if is_kernel:
                return P("model", None)
            if is_bias:
                return P()  # row-parallel bias is added after the psum
    return P()


def _with_fsdp_axis(spec: P, shape: tuple, data_size: int) -> P:
    """Add 'data' to the largest free axis divisible by the data-mesh size.

    ZeRO/FSDP-style parameter + optimizer-state sharding (absent in the
    reference — its DDP replicates params, SURVEY.md §2.5 'FSDP/ZeRO: NO');
    provided because on TPU it is a sharding annotation, not a wrapper:
    GSPMD inserts the all-gathers on use and keeps the AdamW update math
    sharded. Leaves with no divisible free axis stay as-is (replicated over
    'data')."""
    if data_size <= 1:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = -1
    for i, (dim, used) in enumerate(zip(shape, entries)):
        if used is None and dim % data_size == 0 and dim >= data_size:
            if best < 0 or dim > shape[best]:
                best = i
    if best < 0:
        return spec
    entries[best] = "data"
    return P(*entries)


def param_shardings(params: Any, mesh: Mesh, fsdp: bool = False):
    """NamedSharding pytree for params: TP-sharded where profitable, else
    replicated (grads sync over 'data' automatically under jit). With
    fsdp=True, every leaf is additionally sharded over 'data' on its
    largest divisible free axis."""
    data_size = int(mesh.shape["data"])

    def spec(path, leaf):
        s = _spec_for_param(path, leaf)
        if fsdp and hasattr(leaf, "shape"):
            s = _with_fsdp_axis(s, leaf.shape, data_size)
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, params)


def state_shardings(tree: Any, mesh: Mesh, fsdp: bool = False):
    """Shardings for an arbitrary train-state pytree (params, EMA, AdamW
    mu/nu, counters). Named kernels/biases follow the TP rules by path
    suffix (optax moment trees repeat the param paths); with fsdp=True
    non-scalar leaves are sharded over 'data'; scalars stay replicated."""
    data_size = int(mesh.shape["data"])

    def spec(path, leaf):
        if not hasattr(leaf, "shape") or len(leaf.shape) == 0:
            return NamedSharding(mesh, P())
        s = _spec_for_param(path, leaf)
        if fsdp:
            s = _with_fsdp_axis(s, leaf.shape, data_size)
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_params(params: Any, mesh: Mesh, fsdp: bool = False):
    shardings = param_shardings(params, mesh, fsdp=fsdp)
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh, stacked: bool = False) -> NamedSharding:
    """P('data') on the batch axis; stacked=True for [K, B, ...] blocks of
    K batches (the steps-per-call training path) — the leading steps axis is
    sequential, so sharding stays on axis 1."""
    return NamedSharding(mesh, P(None, "data") if stacked else P("data"))


def shard_batch(batch: Any, mesh: Mesh, stacked: bool = False):
    """Shard every array leaf along its leading (batch) axis on 'data'.

    Single-process: a plain device_put scatter. Multi-process: each process
    holds a DIFFERENT local batch (its dataset shard stride — same contract
    as the reference's per-rank microbatch, train/train_mdm.py:47-49), so the
    global array is the concatenation of the per-process locals:
    `jax.make_array_from_process_local_data` assembles [B*P, ...] from the
    local [B, ...] without any host gather. A bare device_put here would
    instead interpret each local batch as the whole global array — silently
    dropping half of every process's data.

    stacked=True: leaves are [K, B, ...] stacks of K batches (one fused
    device call of K train steps); sharding moves to axis 1."""
    sh = batch_sharding(mesh, stacked=stacked)
    multiprocess = jax.process_count() > 1

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            x = np.asarray(x)
            if multiprocess:
                return jax.make_array_from_process_local_data(sh, x)
            return jax.device_put(x, sh)
        return x

    return jax.tree_util.tree_map(put, batch)


def host_local_slice(arr, mesh: Mesh):
    """The rows of a global batch-sharded array owned by THIS process, as
    host numpy (e.g. per-element losses for the loss-aware schedule sampler's
    update_with_local_losses — reference: diffusion/resample.py:83-104)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    # jit outputs carry whatever sharding GSPMD chose; reshard onto the
    # canonical batch sharding before extracting the local view
    arr = jax.device_put(arr, batch_sharding(mesh))
    return np.asarray(
        multihost_utils.global_array_to_host_local_array(
            arr, mesh, P("data")
        )
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_shard_info() -> tuple:
    """(shard, num_shards) for host-side dataset striding — same contract as
    the reference's MPI rank sharding (train/train_mdm.py:47-49)."""
    return jax.process_index(), jax.process_count()
