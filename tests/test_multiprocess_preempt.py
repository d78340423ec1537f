"""Multi-host preemption composition (VERDICT r3 item 6): SIGTERM one rank
of a TRUE 2-process data-parallel pretrain run mid-epoch; both ranks agree
to stop at the same dispatch boundary (core/mesh.py::global_any), write the
cross-process-sharded ZeRO-1 orbax checkpoint + position marker, and exit
0.  Relaunching the same command on both ranks resumes mid-epoch and the
final checkpoint is BIT-EXACT (sha256 over every leaf) with an
uninterrupted 2-process twin.  Reference equivalent: none — killing one
torch DDP rank aborts the whole job (sc/finetune.py:224-235)."""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER = os.path.join(REPO, "tests", "multiprocess_preempt_driver.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_phase(mode: str, workdir: str):
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, DRIVER, str(i), port, workdir, mode],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (mode, out[-2000:], err[-4000:])
        assert f"DONE {mode}" in out, (mode, out)
    return outs


def test_two_process_preempt_resume_bitexact(tmp_path):
    from test_pretrain_cli_e2e import _write_dataset
    from medvill_tpu.core import checkpoint as ckpt_lib
    from medvill_tpu.utils import preempt

    # 64 records -> 32 per host shard -> 4 host-batches/epoch at batch 8
    _write_dataset(tmp_path, n=64)
    workdir = str(tmp_path)
    out_int = os.path.join(workdir, "out_interrupt")

    # phase A: rank 1 is SIGTERM'd at its 3rd dispatch poll; rank 0 (never
    # signaled) must stop too, via the cross-process agreement
    _run_phase("interrupt", workdir)
    marker = preempt.read_marker(out_int)
    assert marker == {"epoch": 0, "batches_done": 3}, marker
    assert ckpt_lib.latest_epoch(out_int) == 0
    log = open(os.path.join(out_int, "train.log")).read()
    assert "preempted" in log, log

    # phase B: same command relaunched on both ranks -> resumes mid-epoch
    outs_resume = _run_phase("resume", workdir)
    assert preempt.read_marker(out_int) is None
    assert ckpt_lib.latest_epoch(out_int) == 1
    log = open(os.path.join(out_int, "train.log")).read()
    assert "resuming preempted run" in log, log

    # phase C: uninterrupted twin
    outs_plain = _run_phase("plain", workdir)

    digests = {}
    for mode, outs in (("resume", outs_resume), ("plain", outs_plain)):
        for rc, out, err in outs:
            lines = [ln for ln in out.splitlines()
                     if ln.startswith(f"DIGEST {mode} ")]
            assert len(lines) == 1, (mode, out)
            _, _, rank, digest = lines[0].split()
            digests[(mode, rank)] = digest
    # per-rank shard digests (rank 0 and 1 each hash their own shards of
    # the zero1 moments + the full replicated params): resumed == plain
    # bit-exactly on both ranks
    for rank in ("0", "1"):
        assert digests[("resume", rank)] == digests[("plain", rank)], \
            digests
