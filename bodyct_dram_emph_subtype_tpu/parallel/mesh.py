"""Device-mesh and sharding utilities — the distributed backbone.

The reference's distributed story is single-node DDP data parallelism over
gloo/nccl (``train.py:70``, ``test.py:60``) with SyncBatchNorm and an
explicit ``cat_all_gather`` for epoch metrics (``utils.py:66-80``).

TPU-native replacement (single-controller GSPMD):
- a ``jax.sharding.Mesh`` over ('data', 'spatial');
- the global batch is sharded over 'data' → gradient psums are inserted by
  XLA (DDP allreduce equivalent);
- activations can additionally be sharded over 'spatial' along H — XLA
  inserts halo exchanges for the 3-D convs, which is how a single volume
  scales past one chip's HBM (the reference has no analog);
- BatchNorm reduces over the sharded batch dim → cross-replica stats ==
  ``sync_batchnorm=True`` for free;
- epoch metrics: arrays come out of jit globally; across *processes* use
  ``multihost_utils.process_allgather`` (the ``cat_all_gather`` analog).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Mesh layout: ``data`` replicas x ``spatial`` shards (volume H axis)
    x ``model`` shards (conv channel axis, tensor parallelism)."""
    data: int = 1
    spatial: int = 1
    model: int = 1

    @property
    def size(self):
        return self.data * self.spatial * self.model


def get_mesh(spec: Optional[MeshSpec] = None,
             devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'spatial', 'model') mesh.  Defaults to all devices
    on the data axis — plain DP, the reference's only strategy."""
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices))
    if spec.size != len(devices):
        raise ValueError(f"mesh {spec} needs {spec.size} devices, "
                         f"got {len(devices)}")
    arr = np.asarray(devices).reshape(spec.data, spec.spatial, spec.model)
    return Mesh(arr, ("data", "spatial", "model"))


# ---------------------------------------------------------------------------
# Active mesh: how the Pallas fast path becomes multi-chip-capable.
#
# pallas_call is an opaque custom call to GSPMD — under a >1-device jit it
# would be computed fully replicated (all-gather + redundant compute), so by
# itself the 'roll'/fused-kernel fast path was single-device-only.  The fix:
# model code registers the training/eval mesh here, and every batch-leading
# Pallas kernel call site routes through :func:`shard_map_data`, which wraps
# the kernel in ``jax.shard_map`` over the 'data' axis (batch-sharded, all
# weights replicated).  The kernels are batch-independent (their tile plans
# never consult B), so the per-shard program is the same program — gradients
# of replicated weights get the structural psum from shard_map's transpose,
# which IS the DDP gradient allreduce (reference ``train.py:70``).
#
# The fast path engages only on data-pure slices of the mesh: when 'spatial'
# or 'model' have extent (activations sharded inside a volume / over
# channels) the per-shard halo/channel math would be wrong, so
# :func:`mesh_fast_path_ok` returns False and the callers' supports_* gates
# fall back to the XLA lowering, which GSPMD partitions natively — loudly,
# once per reason.
# ---------------------------------------------------------------------------

_ACTIVE_MESH: Optional[Mesh] = None
_FALLBACK_WARNED: set = set()


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Register the mesh Pallas fast-path ops partition over (or None to
    disengage).  Trace-time state: set it before jit-tracing model code."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    _FALLBACK_WARNED.clear()


def get_active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def _warn_once(key, msg, *args):
    if key not in _FALLBACK_WARNED:
        _FALLBACK_WARNED.add(key)
        logger.warning(msg, *args)


def _engaged_data_mesh(batch: int) -> Optional[Mesh]:
    """The active mesh when the Pallas fast path should shard_map over
    'data' for a batch of this size; None when a plain (single-device)
    call is the right thing.  Callers must ALSO gate on
    :func:`mesh_fast_path_ok` so unsupported cases take the XLA lowering
    instead of an unpartitioned pallas_call."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1:
        return None
    if mesh.shape.get("spatial", 1) > 1 or mesh.shape.get("model", 1) > 1:
        return None
    n_data = mesh.shape.get("data", 1)
    if n_data <= 1 or batch % n_data:
        return None
    return mesh


def mesh_fast_path_ok(batch: int) -> bool:
    """Gate component for the Pallas fast path under a multi-device mesh:
    True when no multi-device mesh is engaged (plain call) or when
    :func:`shard_map_data` can carry the op (data-only mesh, divisible
    batch).  False => the caller must use its XLA lowering, which GSPMD
    partitions; warns once per reason so the perf cliff is visible."""
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.size <= 1:
        return True
    if mesh.shape.get("spatial", 1) > 1 or mesh.shape.get("model", 1) > 1:
        _warn_once(("axes",), "Pallas fast path disabled: mesh has "
                   "spatial/model extents %s — using the XLA lowering "
                   "(GSPMD-partitioned)", dict(mesh.shape))
        return False
    n_data = mesh.shape.get("data", 1)
    if batch % n_data:
        _warn_once(("batch", batch), "Pallas fast path disabled: batch %d "
                   "not divisible by mesh data axis %d — using the XLA "
                   "lowering", batch, n_data)
        return False
    return True


def shard_map_data(fn, x, *replicated):
    """Call ``fn(x, *replicated)`` partitioned over the active mesh's
    'data' axis (``x`` batch-sharded, the rest replicated); a plain call
    when no multi-device data mesh is engaged.  ``replicated`` entries may
    be arbitrary pytrees (e.g. weight lists).  Gradients flow through
    (shard_map transposes the replicated in_specs into psums — the DDP
    gradient allreduce)."""
    mesh = _engaged_data_mesh(x.shape[0])
    if mesh is None:
        return fn(x, *replicated)
    in_specs = (P("data"),) + tuple(P() for _ in replicated)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P("data"), check_vma=False)(
                             x, *replicated)


def shard_params_tp(mesh: Mesh, tree):
    """Tensor-parallel parameter placement: conv kernels (and their
    channel-wise affine/bias/stats companions) shard the output-channel dim
    over 'model'; everything else replicates.  Under GSPMD jit, activations
    become channel-sharded after each conv and XLA inserts the collectives
    (this is the scaling-book recipe: annotate, let the compiler do the
    comms)."""
    n_model = mesh.shape["model"]

    def place(x):
        shape = np.shape(x)
        if n_model > 1 and len(shape) >= 1 and shape[-1] % n_model == 0 \
                and shape[-1] >= n_model:
            spec = [None] * (len(shape) - 1) + ["model"]
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, tree)


def batch_sharding(mesh: Mesh, spatial_axis: Optional[int] = 2
                   ) -> NamedSharding:
    """Sharding for (B, D, H, W[, C]) batches: B over 'data', H over
    'spatial' (when the mesh has a spatial extent).  Trailing axes in the
    PartitionSpec are implicitly replicated, so the same spec serves rank-4
    and rank-5 values."""
    if mesh.shape["spatial"] > 1 and spatial_axis is not None:
        spec = [None] * (spatial_axis + 1)
        spec[0] = "data"
        spec[spatial_axis] = "spatial"
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_local_data(x) -> np.ndarray:
    """Per-process slice of a batch-sharded global array — the inverse of
    :func:`shard_batch` for jit outputs (predictions, per-sample metrics).

    Multi-process jax.Arrays are not fully addressable, so ``np.asarray``
    would raise; instead the unique batch rows owned by this process's
    devices are concatenated in global order.  Assumes sharding only over
    axis 0 (replicated across 'spatial'/'model' — true for the per-sample
    outputs the train/eval steps emit).  Single-process: the whole array.
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    parts = {}
    for shard in x.addressable_shards:
        index = shard.index
        start = (index[0].start or 0) if index else 0
        if start not in parts:
            parts[start] = np.asarray(shard.data)
    return np.concatenate([parts[s] for s in sorted(parts)], axis=0)


def shard_batch(mesh: Mesh, batch_tree):
    """Device-put a host batch with batch-dim sharding (leaves with a batch
    dim) — the host→HBM transfer of the input pipeline.

    Single-process: a plain ``device_put`` onto the mesh-wide sharding.
    Multi-process (``jax.distributed``): each process holds only its own
    sub-batch, so leaves go through
    ``jax.make_array_from_process_local_data`` — the per-process shards
    assemble into one global jax.Array (the DDP input contract,
    reference ``train.py:70,103``).  The local batch must then be
    ``global_batch / process_count`` (see ``SubtypeTrainer._loader``).
    """
    sharding_nd = batch_sharding(mesh)
    sharding_1d = NamedSharding(mesh, P("data"))
    multiprocess = jax.process_count() > 1

    def fit(sharding, shape):
        """Drop mesh axes that don't divide their dim (JAX rejects uneven
        shardings at device_put/jit boundaries): the leaf is then simply
        replicated along that axis — correct, just less parallel.  Warns
        once per (axis, dim) so a silent perf cliff is visible."""
        spec = list(sharding.spec) + [None] * (len(shape) - len(sharding.spec))
        changed = False
        for d, name in enumerate(spec):
            if name is None:
                continue
            extent = mesh.shape[name]
            if extent > 1 and shape[d] % extent != 0:
                logger.warning(
                    "dim %d (size %d) not divisible by mesh axis %r (=%d); "
                    "replicating that dim instead", d, shape[d], name, extent)
                spec[d] = None
                changed = True
        if not changed:
            return sharding
        while spec and spec[-1] is None:
            spec.pop()
        return NamedSharding(mesh, P(*spec))

    def put(x):
        x = np.asarray(x)
        sharding = sharding_nd if x.ndim >= 4 else sharding_1d
        if multiprocess:
            # batch axis spans processes; all other axes are process-local
            # (get_mesh enumerates devices data-major, so each data row's
            # spatial x model block lives inside one process).  Divisibility
            # is judged on the GLOBAL shape — the local sub-batch is
            # 1/process_count of the batch dim by construction.
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            sharding = fit(sharding, global_shape)
            return jax.make_array_from_process_local_data(sharding, x,
                                                          global_shape)
        sharding = fit(sharding, x.shape)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch_tree)
