"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md section 4 plan: multi-chip logic is tested without a
cluster via 8 virtual CPU devices; Pallas kernels run in interpreter mode on
CPU (auto-selected in the dispatch layer), so the exact same kernel code
paths are exercised in CI and on real TPUs.

Environment quirk: on TPU-tunneled hosts a ``sitecustomize.py`` (on
PYTHONPATH) registers and *initializes* the axon PJRT backend at interpreter
startup, freezing the process at 1 device before any test code can run (the
PJRT CPU client is a per-process singleton, so the device count cannot be
changed afterwards).  The only reliable fix is to re-exec the test process
once with that sitecustomize stripped and CPU forced.  The re-exec happens in
``pytest_configure`` with global capture suspended, so the child's output
goes to the real stdout rather than the dead parent's capture tempfile.
"""

import os
import sys

_SENTINEL = "FLASHATTENTION_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_SENTINEL):
        return False
    pythonpath = os.environ.get("PYTHONPATH", "")
    return "axon_site" in pythonpath or os.environ.get("JAX_PLATFORMS", "") not in (
        "",
        "cpu",
    )


def pytest_configure(config):
    if "tpu" in (config.getoption("markexpr", "") or "") and "not tpu" not in (
        config.getoption("markexpr", "") or ""
    ):
        # `-m tpu`: the compiled-kernel gate (tests/test_compiled.py) wants
        # the REAL accelerator backend — skip the CPU re-exec entirely.
        return
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if "axon_site" not in p]
        + [repo_root]
    )
    sys.stdout.flush()
    sys.stderr.flush()
    os.execvpe(
        sys.executable, [sys.executable, "-m", "pytest", *config.invocation_params.args], env
    )


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", False)
