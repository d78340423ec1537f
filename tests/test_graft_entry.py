"""The driver's multi-chip dryrun must run green in a fresh interpreter.

Round-1 regression: ``__graft_entry__.dryrun_multichip`` ran on the
1-device TPU platform (the site hook force-selects it) and died reshaping
1 device into an 8-mesh.  This test executes the entry exactly the way the
driver does — a clean subprocess with no conftest help — so the platform
forcing inside the entry itself is what's under test.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    # strip the conftest's own platform forcing so the entry must do it
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "ok" in proc.stdout
