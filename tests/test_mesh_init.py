"""multihost_initialize must (a) no-op on single-host boxes even when the
TPU runtime exports TPU_WORKER_HOSTNAMES=localhost (round-2 regression), and
(b) decide from the environment BEFORE touching any jax backend — calling
jax.process_count() first would poison jax.distributed.initialize()."""
import os
from unittest import mock

from medvill_tpu.core.mesh import multihost_initialize


def test_noop_single_host_with_localhost_worker():
    env = {k: v for k, v in os.environ.items()}
    env["TPU_WORKER_HOSTNAMES"] = "localhost"
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        env.pop(k, None)
    with mock.patch.dict(os.environ, env, clear=True):
        with mock.patch("jax.distributed.initialize") as init:
            multihost_initialize()
            init.assert_not_called()


def test_initializes_when_coordinator_configured():
    with mock.patch.dict(os.environ,
                         {"JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234"}):
        with mock.patch("jax.distributed.initialize") as init:
            multihost_initialize()
            init.assert_called_once()


def test_initializes_when_multiple_workers():
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["TPU_WORKER_HOSTNAMES"] = "host0,host1"
    with mock.patch.dict(os.environ, env, clear=True):
        with mock.patch("jax.distributed.initialize") as init:
            multihost_initialize()
            init.assert_called_once()


def test_already_initialized_swallowed_other_errors_raise():
    import pytest

    with mock.patch.dict(os.environ,
                         {"JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234"}):
        with mock.patch("jax.distributed.initialize",
                        side_effect=RuntimeError("already initialized")):
            multihost_initialize()  # swallowed
        with mock.patch("jax.distributed.initialize",
                        side_effect=RuntimeError("connection refused")):
            with pytest.raises(RuntimeError):
                multihost_initialize()
