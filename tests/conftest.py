"""Test harness configuration.

Runs the whole suite on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``) so multi-chip sharding paths
compile and execute without TPU hardware, and enables x64 so numerical-parity
tests against float64 NumPy/SciPy oracles are meaningful.
"""

import os
import sys

# Force CPU: the harness presets JAX_PLATFORMS=axon (the tunneled TPU), and
# running the suite there means slow tunnel compiles + single-device
# contention with any concurrent driver script.  The axon sitecustomize also
# imports jax at interpreter start, which locks in XLA_FLAGS before any user
# code runs — so a virtual 8-device CPU mesh can only be had by re-executing
# pytest with the plugin disabled and the flags already in the environment.
# NOTE: the axon sitecustomize imports jax at interpreter start, so the
# 8-device flag only works when it is in the environment *before* python
# launches with the plugin disabled (PALLAS_AXON_POOL_IPS="").  Multi-device
# tests therefore run their checks in a clean subprocess (test_sharding.py)
# rather than relying on this process's device count.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


def pytest_configure(config):
    """Re-exec the test run with the axon TPU plugin disabled.

    The plugin's sitecustomize hooks interpreter start: it slows CPU-only
    compiles ~30x (remote-compile indirection) and hangs outright whenever
    the TPU tunnel is wedged.  Both are fixed only by clearing
    PALLAS_AXON_POOL_IPS *before* python starts — so re-exec once, after
    stopping pytest's fd capture so output still reaches the caller.
    """
    if (os.environ.get("PALLAS_AXON_POOL_IPS")
            and os.environ.get("HICHAP_TPU_TEST_REEXEC") != "1"):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            try:
                capman.stop_global_capturing()
            except Exception:
                pass
        env = dict(os.environ)
        env["HICHAP_TPU_TEST_REEXEC"] = "1"
        # keep the plugin address around: @pytest.mark.tpu tests restore it
        # in their own clean subprocesses (save BEFORE popping)
        env["HICHAP_SAVED_AXON_IPS"] = env.pop("PALLAS_AXON_POOL_IPS", "")
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
        sys.stdout.write("[conftest] re-exec without axon TPU plugin\n")
        sys.stdout.flush()
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
    config.addinivalue_line(
        "markers",
        "tpu: needs a real TPU chip (compiled Mosaic parity etc.); "
        "auto-skipped unless HICHAP_TPU_TESTS=1 is set by a runner that "
        "has one")


def pytest_collection_modifyitems(config, items):
    """Auto-skip @pytest.mark.tpu off-chip.

    The suite itself always runs on CPU (see above) — TPU-marked tests
    drive the chip from clean subprocesses, which only works when the
    runner opts in with HICHAP_TPU_TESTS=1 while the tunnel is live
    (probing the tunnel automatically can hang the whole suite when it is
    wedged, see .claude/skills/verify)."""
    if os.environ.get("HICHAP_TPU_TESTS") == "1":
        return
    skip = pytest.mark.skip(
        reason="no TPU opt-in (HICHAP_TPU_TESTS=1 with a live chip)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
