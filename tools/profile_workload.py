"""Capture a device trace of ANY bench.py workload's timed loop and print
the per-module / per-op-category device-time split (the numbers behind the
DESIGN.md tuning ledgers — same parser as tools/profile_pretrain.py).

Usage:
    python tools/profile_workload.py classify [batch] [iters] [k]
    python tools/profile_workload.py retrieve [pairs] [iters] [k]
    python tools/profile_workload.py finetune [batch] [iters] [k]

Runs ``bench.py <argv...>`` in-process with ``MEDVILL_BENCH_TRACE`` set
(the benches wrap their timed loop in ``jax.profiler`` start/stop when the
env var names a directory), then parses the newest ``.xplane.pb``.
The bench's own JSON metric line prints first, so every trace comes with
the throughput it corresponds to.
"""
from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

TRACE_DIR = "/tmp/medvill_trace_workload"


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        raise SystemExit(0)
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    os.environ["MEDVILL_BENCH_TRACE"] = TRACE_DIR

    from medvill_tpu.utils import jax_cache

    jax_cache.enable()

    import bench

    # reuse bench.py's own CLI dispatch so a profiled config can never
    # drift from the benched one (same parsing, same defaults)
    sys.argv = ["bench.py"] + sys.argv[1:]
    bench.main()

    import profile_pretrain

    profile_pretrain.TRACE_DIR = TRACE_DIR
    profile_pretrain.parse_xplane()


if __name__ == "__main__":
    main()
