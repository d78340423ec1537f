"""Two-process preemption driver: SIGTERM one rank, both stop in sync.

Run by tests/test_multiprocess_preempt.py as ``python
tests/multiprocess_preempt_driver.py <proc_id> <port> <workdir> <mode>``
twice concurrently.  This composes the three multi-host mechanisms that
tests cover separately elsewhere — the 2-process Gloo harness
(multiprocess_driver.py), the SIGTERM preemption guard (test_preempt.py)
and the cross-process-sharded orbax checkpoint (--zero1) — into the full
production story: a maintenance event SIGTERMs ONE host mid-epoch, every
host agrees to stop at the same dispatch boundary
(``core.mesh.global_any`` — without the agreement the unsignaled rank
hangs in its next gradient all-reduce), all hosts write their checkpoint
shards + the position marker, both exit 0; relaunching the SAME command on
both hosts resumes mid-epoch and converges BIT-EXACTLY with an
uninterrupted twin run.  Reference equivalent: none — killing one torch
DDP rank aborts the job and loses everything since the last epoch
checkpoint (sc/finetune.py:224-235,474-493).

Modes:
  interrupt  rank 1's guard delivers a real self-SIGTERM (os.kill) at its
             3rd dispatch poll — deterministic mid-epoch-0 preemption
             through the real signal path; rank 0 is never signaled and
             must stop via the cross-process agreement
  resume     plain relaunch of the same command/output dir (consumes the
             marker, finishes the run)
  plain      uninterrupted twin into its own output dir

After a completed run (resume/plain) the driver prints ``DIGEST <mode>
<proc_id> <sha256>`` over every leaf of the final-epoch checkpoint
(params, opt_state moments, batch_stats — replicated through jit and
hashed bytes-exact in deterministic key order); the parent asserts all
four digests (2 modes x 2 ranks) are identical.
"""
import os
import signal
import sys

proc_id, port, workdir, mode = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                                sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=2"
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(proc_id)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medvill_tpu.utils import preempt  # noqa: E402

if mode == "interrupt" and proc_id == 1:
    _Real = preempt.PreemptionGuard

    class _SelfSignalGuard(_Real):
        """Deterministic mid-epoch preemption through the REAL signal
        path: the 3rd dispatch poll first delivers SIGTERM to this very
        process (kernel -> handler -> flag), then reads the flag."""

        _polls = 0

        @property
        def triggered(self):
            _SelfSignalGuard._polls += 1
            if _SelfSignalGuard._polls == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            return _Real.triggered.fget(self)

    preempt.PreemptionGuard = _SelfSignalGuard

from medvill_tpu.cli import pretrain_main  # noqa: E402

out = os.path.join(workdir, "out_plain" if mode == "plain"
                   else "out_interrupt")
args = pretrain_main.build_parser().parse_args([
    "--train_dataset", os.path.join(workdir, "train.jsonl"),
    "--vocab_file", os.path.join(workdir, "vocab.txt"),
    "--output_path", out, "--bert_model", "test-tiny",
    "--vocab_size", "32", "--epochs", "2", "--batch_size", "8",
    "--num_image_embeds", "3", "--img_size", "64", "--seq_len", "7",
    "--gradient_accumulation_steps", "1", "--num_workers", "2",
    "--zero1", "true",
])
pretrain_main.train(args)

if mode in ("resume", "plain"):
    # bytes-exact digest of the final checkpoint: hash THIS rank's
    # addressable shards of every leaf (sorted by leaf key and shard
    # index, replicated copies deduped).  No collective and no resharding
    # — an out-of-jit reshard of the cross-process zero1 moments would
    # need DCN transport that the CPU Gloo harness doesn't have.  Both
    # runs restore with identical process/device layouts, so rank r's
    # digest is comparable across modes, and ranks 0+1 together cover
    # every shard.
    import hashlib

    import numpy as np

    from medvill_tpu.core import checkpoint as ckpt_lib

    restored = ckpt_lib._checkpointer().restore(
        os.path.abspath(os.path.join(out, "1")))
    h = hashlib.sha256()
    leaves = jax.tree_util.tree_flatten_with_path(restored)[0]
    for path, leaf in leaves:
        key = jax.tree_util.keystr(path)
        h.update(key.encode())
        if not isinstance(leaf, jax.Array):
            arr = np.asarray(leaf)
            h.update(str(arr.dtype).encode())
            h.update(arr.tobytes())
            continue
        h.update(str(leaf.dtype).encode())
        h.update(str(leaf.shape).encode())
        seen = set()
        for s in sorted(leaf.addressable_shards,
                        key=lambda s: repr(s.index)):
            ix = repr(s.index)
            if ix in seen:
                continue
            seen.add(ix)
            h.update(ix.encode())
            h.update(np.asarray(s.data).tobytes())
    print(f"DIGEST {mode} {proc_id} {h.hexdigest()}", flush=True)

print(f"DONE {mode} {proc_id}", flush=True)
