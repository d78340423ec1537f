"""Device mesh + sharding helpers.

The reference scales with ``nn.DataParallel`` / NCCL DDP (reference:
models/train_origin.py:53-55, sc/finetune.py:224-235).  Here a single pjit
program is laid out over a ``jax.sharding.Mesh`` with a ``data`` axis; XLA
emits all-reduces over ICI (intra-slice) / DCN (inter-slice).  The same program
runs on 1 chip or a pod slice.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Sequence[int] = (-1,), axis_names: Sequence[str] = (DATA_AXIS,),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a mesh; -1 in `shape` absorbs the remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1])) or 1
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_pspec(mesh: Mesh) -> P:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return P(DATA_AXIS)


def _put_sharded(mesh: Mesh, x, spec: P):
    """Single-process: plain device_put.  Multi-process: each host holds
    only ITS loader shard (BatchLoader(num_shards, shard_index) — the
    DistributedSampler equivalent), so the global array is assembled from
    the per-process locals; device_put would reject the local-vs-global
    shape mismatch."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, x)
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host pytree batch with the leading dim sharded over `data`.
    Under multi-process runs ``batch`` is this host's loader shard; the
    result is the global [sum-of-host-batches, ...] array."""
    def put(x):
        spec = P(DATA_AXIS, *([None] * (np.ndim(x) - 1)))
        return _put_sharded(mesh, x, spec)
    return jax.tree_util.tree_map(put, batch)


def shard_stacked_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a [k, B, ...] micro-step-stacked pytree batch (see
    train.pretrain.make_multi_train_step): axis 0 is the per-dispatch
    micro-step index (replicated), axis 1 the per-chip batch (sharded over
    `data`)."""
    def put(x):
        spec = P(None, DATA_AXIS, *([None] * (np.ndim(x) - 2)))
        return _put_sharded(mesh, x, spec)
    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params / optimizer state) over the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def tp_spec(path: str, ndim: int) -> P:
    """Megatron-style tensor-parallel PartitionSpec for one leaf of the BERT
    joint-encoder tree, keyed on the flax module path (models/bert.py names).

    Column-parallel (shard the output features over ``model``): the QKV
    projections — sharding the fused head dim H = heads·head_dim splits
    whole heads as long as ``num_attention_heads % model_axis == 0`` — and
    the FFN ``intermediate`` dense.  Row-parallel (shard the input
    features; XLA inserts the all-reduce that Megatron calls ``g``): the
    attention ``attention_output/dense`` and the FFN ``output_dense``.
    Biases of column-parallel layers shard with the features they produce;
    row-parallel biases, LayerNorms, embeddings, heads, and the (frozen)
    ResNet trunk replicate.  The fused single-parameter QKV layout
    (``BertConfig.fused_qkv``, off by default) interleaves q|k|v along the
    output dim and is left replicated rather than sharded across the q/k/v
    boundaries.

    The same rule applies verbatim to optimizer-state leaves (adam mu/nu
    mirror the param tree paths), so one function shards the whole
    TrainState consistently.
    """
    leaf_of = lambda *names: any(f"'{n}'" in path or f"/{n}/" in path
                                 or path.endswith(n) for n in names)
    is_kernel = path.endswith("kernel']") or path.endswith("kernel")
    is_bias = path.endswith("bias']") or path.endswith("bias")
    col = leaf_of("query", "key", "value", "intermediate")
    row = leaf_of("attention_output", "output_dense") and "LayerNorm" \
        not in path
    # attention_output contains both 'dense' (row-parallel) and its
    # LayerNorm (replicated); output_dense is the FFN down-projection
    if col and is_kernel and ndim == 2:
        return P(None, MODEL_AXIS)
    if col and is_bias and ndim == 1:
        return P(MODEL_AXIS)
    if row and is_kernel and ndim == 2 and leaf_of("dense", "output_dense"):
        return P(MODEL_AXIS, None)
    return P()


def tp_shard(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree (params / TrainState / optimizer state) with
    tensor-parallel shardings over the mesh's ``model`` axis and the rest
    replicated.  Requires ``num_attention_heads % mesh.shape['model'] == 0``
    and ``intermediate_size % mesh.shape['model'] == 0``; combine with a
    ``data`` axis for 2-D (data x tensor) parallelism — XLA GSPMD inserts
    the gradient all-reduce over ``data`` and the Megatron activation
    collectives over ``model``."""
    def put(path, x):
        spec = tp_spec(jax.tree_util.keystr(path), np.ndim(x))
        # never shard a dim the axis size doesn't divide (e.g. a tiny
        # head count); GSPMD would reject it at lowering
        m = mesh.shape.get(MODEL_AXIS, 1)
        for dim, name in enumerate(spec):
            if name == MODEL_AXIS and np.shape(x)[dim] % m:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(put, tree)


def zero1_shard(mesh: Mesh, tree: Any) -> Any:
    """ZeRO-1 optimizer-state sharding (beyond parity — the reference has no
    equivalent; Rajbhandari et al., arXiv:1910.02054).  Adam first/second
    moments (the ``mu``/``nu`` leaves of the optax state) are sharded over
    the ``data`` axis so each chip stores 1/N of the optimizer state —
    ~880 MB replicated for BERT-base's ~110 M params in f32 mu+nu.  XLA
    GSPMD then computes each moment update on the local shard and
    all-gathers the parameter delta, which is exactly ZeRO-1's collective
    schedule.  Every other leaf (params, counts, batch stats) keeps the
    base placement: :func:`tp_spec` when the mesh has a ``model`` axis of
    size > 1, replicated otherwise — so ZeRO-1 composes with tensor
    parallelism on a 2-D mesh.

    A moment leaf shards on its first dimension the ``data``-axis size
    divides that ``tp_spec`` left free (so e.g. the [30522, 768] vocab
    embedding moments shard over the hidden dim on an 8-chip mesh);
    leaves with no divisible free dim stay on the base placement.
    """
    import re

    data = mesh.shape.get(DATA_AXIS, 1)
    model = mesh.shape.get(MODEL_AXIS, 1)
    # optax moment subtrees render as `.mu[...]` (NamedTuple field) or
    # `['mu'][...]` (dict key) depending on the wrapper
    moment = re.compile(r"(\.|\[')(mu|nu)('\])?(\[|$)")

    def put(path, x):
        s = jax.tree_util.keystr(path)
        base = tp_spec(s, np.ndim(x)) if model > 1 else P()
        for dim, name in enumerate(base):
            if name == MODEL_AXIS and np.shape(x)[dim] % model:
                base = P()
                break
        spec = base
        if moment.search(s) and data > 1 and np.ndim(x) >= 1:
            dims = list(base) + [None] * (np.ndim(x) - len(base))
            for d in range(np.ndim(x)):
                if dims[d] is None and np.shape(x)[d] % data == 0 \
                        and np.shape(x)[d] > 0:
                    dims[d] = DATA_AXIS
                    spec = P(*dims)
                    break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def cli_mesh_and_place(mesh_shape: Sequence[int], model_parallel: int = 1,
                       zero1: bool = False, num_heads: int | None = None):
    """(mesh, place_fn) for a CLI entry point: the default 1-D ``data`` mesh
    with replicated state, or — when ``model_parallel > 1`` — a 2-D
    ``(data, model)`` mesh with the state tensor-parallel-sharded via
    :func:`tp_shard`.  ``zero1=True`` additionally shards the Adam moments
    over ``data`` via :func:`zero1_shard` (composes with either mesh).

    ``num_heads`` (when known) fails fast on head-splitting TP degrees:
    hidden-dim divisibility alone would let e.g. 12-head/768-hidden BERT
    "shard" under ``model_parallel=8`` — the attention shard_map path then
    silently declines (12 % 8 != 0) and every chip would redundantly
    compute full attention over all-gathered activations."""
    from medvill_tpu.ops.flash_attention import set_attention_mesh

    if model_parallel and model_parallel > 1:
        if num_heads is not None and num_heads % model_parallel:
            raise ValueError(
                f"--model_parallel {model_parallel} must divide "
                f"num_attention_heads={num_heads} (Megatron head sharding)")
        mesh = make_mesh((-1, model_parallel), (DATA_AXIS, MODEL_AXIS))
        set_attention_mesh(mesh)  # Pallas kernel runs per-shard (shard_map)
        if zero1:
            return mesh, lambda tree: zero1_shard(mesh, tree)
        return mesh, lambda tree: tp_shard(mesh, tree)
    mesh = make_mesh(mesh_shape)
    set_attention_mesh(mesh)
    if zero1:
        return mesh, lambda tree: zero1_shard(mesh, tree)
    return mesh, lambda tree: replicate(mesh, tree)


_GLOBAL_ANY_CACHE: dict = {}


def global_any(mesh: Mesh, flag: bool) -> bool:
    """Cross-process OR of a per-process boolean.

    Multi-host preemption agreement: a SIGTERM lands on ONE host (spot /
    maintenance events are per-VM), but every host must leave the
    collective-bearing train loop at the SAME dispatch boundary or the
    others hang in the next gradient all-reduce.  Each trainer therefore
    polls ``global_any(mesh, guard.triggered)`` instead of the local flag
    when ``jax.process_count() > 1``: a one-element-per-device max over the
    mesh whose replicated scalar result is read back on every host.

    Single-process runs short-circuit to the local flag — no device work,
    byte-identical behavior to the pre-multihost code path.

    The device read-back synchronizes the host with the device stream once
    per poll; at the recommended ``--steps_per_dispatch`` settings (k>=10)
    that sync hides entirely behind the multi-second dispatch it follows.
    No reference equivalent: torch DDP simply dies collectively when one
    rank is killed (sc/finetune.py:224-235).
    """
    if jax.process_count() == 1:
        return bool(flag)
    import jax.numpy as jnp

    # keyed on the Mesh itself (Mesh is hashable by value): an id() key
    # could silently alias a garbage-collected mesh whose id was reused by
    # a new Mesh with different devices/axes
    cached = _GLOBAL_ANY_CACHE.get(mesh)
    if cached is None:
        sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        rep = NamedSharding(mesh, P())
        reduce = jax.jit(jnp.max, out_shardings=rep)
        _GLOBAL_ANY_CACHE[mesh] = (sharding, reduce)
    else:
        sharding, reduce = cached
    local = np.full((jax.local_device_count(),), 1.0 if flag else 0.0,
                    np.float32)
    garr = jax.make_array_from_process_local_data(sharding, local)
    return bool(float(jax.device_get(reduce(garr))) > 0.0)


def multihost_initialize() -> None:
    """Multi-host entry (reference DDP equivalent: sc/finetune.py:224-235).

    Must be called BEFORE any other jax API touches a backend: querying
    ``jax.process_count()`` first would initialize a local single-process
    backend and make the subsequent ``jax.distributed.initialize()`` raise.
    We therefore decide from the environment alone, and only swallow the
    "already initialized" case — a real coordinator failure propagates.
    """
    import os

    # a coordinator is configured either explicitly or by the TPU pod
    # metadata jax.distributed reads natively; note single-host TPU runtimes
    # also export TPU_WORKER_HOSTNAMES (as "localhost"), so that var only
    # signals multi-host when it lists more than one worker
    multi = any(os.environ.get(k) for k in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS"))
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi = multi or len([w for w in workers.split(",") if w.strip()]) > 1
    if not multi:
        return  # single-process run: nothing to do
    # generic (non-TPU-pod) clusters: jax's argless initialize() only
    # auto-detects recognized environments (TPU pod metadata, SLURM, ...);
    # when the coordinator is configured via env vars, pass them explicitly
    # (proven end-to-end by tests/test_multiprocess_dp.py on 2 CPU processes)
    kwargs = {}
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        kwargs = dict(coordinator_address=addr, num_processes=int(nproc),
                      process_id=int(pid))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
