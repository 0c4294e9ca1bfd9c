"""On-hardware kernel regression gate.

The suite itself runs latched to CPU (``conftest.py``), so real-TPU parity
is delegated to ``tools/tpu_smoke.py`` executed in a clean-env subprocess —
the same isolation trick ``__graft_entry__.dryrun_multichip`` uses.  Opt in
with ``FLUID_TPU_TESTS=1`` (done by the on-TPU smoke in the verify recipe);
default is skip so the CPU suite stays hermetic and fast.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.skipif(
    os.environ.get("FLUID_TPU_TESTS") != "1",
    reason="real-TPU kernel smoke: set FLUID_TPU_TESTS=1 on a TPU host",
)
def test_tpu_kernel_parity_smoke():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "FLUID_TPU_TESTS")
    }
    env["FLUID_STRICT_KERNELS"] = "1"  # a broken kernel must fail, not fall back
    proc = subprocess.run(
        [sys.executable, "-m", "fluid_llm_tpu.tools.tpu_smoke"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "ALL OK" in proc.stdout
