"""Compiled-mode Mosaic parity for the fused Pallas escalation ladder.

The rest of the suite runs the kernel in interpret mode on CPU; these
tests compile the real thing on the chip and are the regression gate for
the four documented Mosaic-lowering pitfalls
(kernels/pallas_escalation.py).  Auto-skipped off-chip — run with
``HICHAP_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py`` on a
host with a live TPU (never concurrently with another TPU process).
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.tpu
def test_pallas_compiled_parity_on_chip():
    env = dict(os.environ)
    # restore the axon plugin (conftest strips it for the CPU suite) and
    # let the default platform resolution find the chip
    saved = env.get("HICHAP_SAVED_AXON_IPS")
    if saved:
        env["PALLAS_AXON_POOL_IPS"] = saved
    env.pop("JAX_PLATFORMS", None)
    env.pop("HICHAP_TPU_TEST_REEXEC", None)
    proc = subprocess.run(
        [sys.executable, "-m", "hichap_master_tpu.testing.pallas_check"],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PALLAS_PARITY_OK" in proc.stdout
