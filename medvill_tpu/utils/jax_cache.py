"""Durable, machine-keyed persistent XLA compile cache.

One shared helper for every entry point that enables jax's persistent
compilation cache (bench.py, tests/conftest.py, tools/, __graft_entry__).

Why not just ``/tmp/jax_cache`` (rounds 1-4):

- **not durable**: ``/tmp`` is wiped between driver sessions, so the
  round-4 official bench paid cold remote-tunnel compiles and had to skip
  sub-modes (BENCH_r04 tail), even though round 3 had compiled the exact
  same programs;
- **not machine-keyed**: the jax cache key does not capture the host CPU's
  feature set, so AOT entries compiled on a box with
  ``+prefer-no-gather/+prefer-no-scatter`` were loaded on a box without
  them — XLA warns "could lead to execution errors such as SIGILL", and a
  foreign entry for one backend but not another produced a deterministic
  ulp-level divergence in an equivalence test (VERDICT r4 "What's weak" #1).

``cache_dir()`` therefore returns ``~/.cache/medvill_jax/<key>/`` where
``<key>`` hashes the jax version, the CPU ISA feature flags
(``/proc/cpuinfo``), and the machine architecture: two machines share a
directory only when their compiled artifacts are actually interchangeable.
Warm-run marker files (bench.py) live in the same directory so marker and
cache expire together.
"""
from __future__ import annotations

import hashlib
import os


def machine_key() -> str:
    """Hash of everything that makes a compiled artifact host-specific:
    jax version (cache format + compiler), CPU feature flags (AOT codegen
    targets the build host's ISA extensions), and architecture."""
    import platform

    import jax

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    # identical on every core; first occurrence suffices
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    blob = "|".join((jax.__version__, platform.machine(), flags))
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def cache_dir() -> str:
    """The durable machine-keyed cache directory (created on first call).
    ``MEDVILL_JAX_CACHE_DIR`` overrides (tests use it to simulate a cold
    cache); falls back to /tmp when $HOME is unwritable."""
    override = os.environ.get("MEDVILL_JAX_CACHE_DIR")
    if override:
        os.makedirs(override, exist_ok=True)
        return override
    base = os.path.join(os.path.expanduser("~"), ".cache", "medvill_jax")
    d = os.path.join(base, machine_key())
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        d = os.path.join("/tmp", "medvill_jax", machine_key())
        os.makedirs(d, exist_ok=True)
    return d


def enable(min_compile_secs: float = 1.0) -> str:
    """Point jax's persistent compilation cache at :func:`cache_dir` and
    return the directory."""
    import jax

    d = cache_dir()
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return d


def warm_marker_path(slug_parts) -> str:
    """Path of the marker recording that a program keyed by ``slug_parts``
    reached the persistent cache once.  Lives inside :func:`cache_dir` so
    the marker can never outlive (or predate) the cache entries it vouches
    for — the round-4 failure mode was exactly a marker directory that was
    wiped independently of the budget logic reading it."""
    slug = "-".join(str(p) for p in slug_parts)
    safe = "".join(c if (c.isalnum() or c in "-._") else "_" for c in slug)
    return os.path.join(cache_dir(), ".warm_" + safe)


def is_warm(slug_parts) -> bool:
    return os.path.exists(warm_marker_path(slug_parts))


def mark_warm(slug_parts) -> None:
    try:
        open(warm_marker_path(slug_parts), "w").close()
    except OSError:
        pass
