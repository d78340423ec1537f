"""Two-process data-parallel driver: the real DDP-equivalent path.

Run by tests/test_multiprocess_dp.py as ``python tests/multiprocess_driver.py
<proc_id> <port>`` twice concurrently.  Unlike the single-process virtual-mesh
tests, this exercises the TRUE multi-host stack end to end: env-var
coordinator wiring through ``core.mesh.multihost_initialize``, Gloo
cross-process collectives, per-host ``BatchLoader(num_shards, shard_index)``
dataset shards, global-array assembly in ``shard_batch``
(``make_array_from_process_local_data``), replicated params, and the jitted
pretrain train step whose gradient all-reduce spans both processes.
Reference equivalent: torch DDP + DistributedSampler (sc/finetune.py:224-235,
285-288).

Prints one line ``LOSS <proc_id> <loss>`` per step; the parent test asserts
both processes print identical finite losses (the replicated state stays
bit-identical across hosts — DDP's invariant).
"""
import os
import sys

proc_id, port = int(sys.argv[1]), sys.argv[2]
ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else None

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=2"
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
os.environ["XLA_FLAGS"] = flags.strip()
# the generic-cluster coordinator wiring multihost_initialize must honor
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(proc_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medvill_tpu.core.mesh import (make_mesh, multihost_initialize,  # noqa: E402
                                   replicate, shard_batch)

multihost_initialize()
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == proc_id

import numpy as np  # noqa: E402

from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,  # noqa: E402
                                     PretrainConfig)
from medvill_tpu.data.pretrain import (BatchLoader, CXRPretrainDataset,  # noqa: E402
                                       synthetic_records)
from medvill_tpu.data.tokenization import BertTokenizer, build_vocab  # noqa: E402
from medvill_tpu.models import resnet as resnet_lib  # noqa: E402
from medvill_tpu.train import optim  # noqa: E402
from medvill_tpu.train.pretrain import init_state, make_train_step  # noqa: E402

N_DEV = 4          # 2 processes x 2 virtual devices
PER_HOST_B = 4     # global batch 8, 2 per device

cfg = PretrainConfig(
    batch_size=2 * N_DEV,
    seq_len=7,
    bert=BertConfig.test_tiny(vocab_size=32),
    image=ImageEncoderConfig(img_size=64, num_image_embeds=3),
    lr=1e-3,
)
mesh = make_mesh((-1,))
assert mesh.size == N_DEV
from medvill_tpu.ops.flash_attention import set_attention_mesh  # noqa: E402

set_attention_mesh(mesh)

tx = optim.masked_trainable(
    optim.adamw(cfg.lr),
    lambda p: resnet_lib.cnn_freeze_mask(p, ("enc", "img_encoder")))
model, state = init_state(cfg, jax.random.PRNGKey(0), tx)
state = replicate(mesh, state)

# per-host dataset shard — every host shuffles the SAME epoch order (shared
# seed) then takes a disjoint stride slice, like DistributedSampler
words = [f"w{i}" for i in range(20)]
tok = BertTokenizer(build_vocab(words))  # specials prepended by build_vocab


class _GrayImages:
    def __call__(self, path):
        rng = np.random.default_rng(abs(hash(path)) % (2 ** 31))
        return rng.standard_normal((64, 64, 3)).astype(np.float32)


ds = CXRPretrainDataset(
    synthetic_records(16, words=words), tok, cfg, seed=0,
    image_loader=_GrayImages())
loader = BatchLoader(ds, PER_HOST_B, shuffle=True, seed=0,
                     num_shards=2, shard_index=proc_id)

step = jax.jit(make_train_step(model, tx, cfg))
key = jax.random.PRNGKey(1)
for i, host_batch in enumerate(loader):
    if i >= 2:
        break
    sharded = shard_batch(mesh, host_batch)
    assert sharded["input_txt"].shape[0] == 2 * PER_HOST_B  # global batch
    key, sub = jax.random.split(key)
    state, metrics = step(state, sharded, sub)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss)
    print(f"LOSS {proc_id} {i} {loss:.6f}", flush=True)

if ckpt_dir:
    # --- ZeRO-1 across processes: the Adam moments shard over a data axis
    # that SPANS both hosts, so state is no longer fully addressable; the
    # train step's moment update + delta all-gather and the orbax
    # distributed checkpoint writer must both span hosts too.
    from medvill_tpu.core import checkpoint as ckpt_lib
    from medvill_tpu.core.mesh import zero1_shard

    zstate = zero1_shard(mesh, state)
    assert not ckpt_lib.fully_addressable(zstate), \
        "zero1 moments should cross processes on this mesh"
    assert ckpt_lib.is_saving_process(zstate)  # every host writes its shards
    key, sub = jax.random.split(key)
    zstate, zmetrics = step(zstate, shard_batch(mesh, host_batch), sub)
    zloss = float(np.asarray(jax.device_get(zmetrics["loss"])))
    assert np.isfinite(zloss)
    print(f"ZLOSS {proc_id} {zloss:.6f}", flush=True)

    path = ckpt_lib.save(ckpt_dir, 0, zstate, config={"multihost": True})
    # untyped restore brings the moments back in their SAVED cross-process
    # sharded layout — reduce them with a jitted global sum (the replicated
    # scalar is addressable everywhere), proving the restored arrays are
    # computable distributed arrays, not just bytes
    import jax.numpy as jnp

    restored = ckpt_lib._checkpointer().restore(os.path.abspath(path))
    cksum = np.float64(0)
    for x in jax.tree_util.tree_leaves(restored["opt_state"]):
        if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype,
                                                       jnp.floating):
            cksum += float(jax.jit(lambda a: jnp.sum(jnp.abs(a)))(x))
    print(f"CKSUM {proc_id} {cksum:.6e}", flush=True)
    # the restored params must equal the live post-step ones bit-exactly;
    # compare with a jitted global reduction (after a zero1 step jit may
    # leave even params output-sharded across processes, so a host-side
    # device_get comparison is not possible)
    def _assert_eq(a, b):
        assert bool(jax.jit(lambda x, y: jnp.all(x == y))(a, b)), \
            "restored param differs from live param"

    jax.tree_util.tree_map(_assert_eq, restored["params"], zstate.params)

    # resume path: restore INTO the live cross-process-sharded target
    # (each host reads its own shards back) and take one more step — the
    # multi-host failure-recovery flow
    resumed = ckpt_lib.restore(ckpt_dir, 0, zstate)
    key, sub = jax.random.split(key)
    r1, rmetrics = step(resumed, shard_batch(mesh, host_batch), sub)
    z1, zmetrics2 = step(zstate, shard_batch(mesh, host_batch), sub)
    rloss = float(np.asarray(jax.device_get(rmetrics["loss"])))
    zloss2 = float(np.asarray(jax.device_get(zmetrics2["loss"])))
    assert rloss == zloss2, (rloss, zloss2)  # resumed == uninterrupted
    print(f"RLOSS {proc_id} {rloss:.6f}", flush=True)

print(f"DONE {proc_id}", flush=True)
