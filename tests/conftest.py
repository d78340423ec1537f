"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (the TPU substitute for fake multi-node; SURVEY.md §4).

Note: the TPU environment's site hook force-selects its platform via
``jax.config``, so setting ``JAX_PLATFORMS`` in the environment is not
enough — we must override the config after import and drop any
already-initialized backends.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# On a 1-core box the 8 virtual device threads timeshare; XLA CPU's default
# 40s collective-rendezvous termination timeout then kills healthy runs
# while another graph compiles.  Raise it.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the CI box has 1 CPU core, so re-compiles
# dominate test time without it.  Machine-keyed durable dir (NOT
# /tmp/jax_cache): a cache shared across machines loaded foreign-ISA AOT
# entries (XLA SIGILL warning) and made an equivalence test order-dependent
# (VERDICT r4) — utils/jax_cache keys the dir by CPU features + jax version.
from medvill_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable()
try:
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
except Exception:
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_tokenizer():
    from medvill_tpu.data.tokenization import BertTokenizer, build_vocab
    words = [f"word{i}" for i in range(50)]
    vocab = build_vocab(words)
    return BertTokenizer(vocab)


@pytest.fixture(autouse=True)
def _reset_attention_mesh():
    """set_attention_mesh is process-global (one mesh per real run); reset
    after each test so a CLI e2e or dryrun test cannot leak its mesh into
    later tests."""
    yield
    try:
        from medvill_tpu.ops.flash_attention import set_attention_mesh

        set_attention_mesh(None)
    except Exception:
        pass
