"""Early pytest plugin: re-exec onto a clean 8-device virtual-CPU JAX env.

The container environment may install a sitecustomize that imports jax at
interpreter startup and pins an experimental TPU-tunnel platform. Tests must
instead run on 8 virtual CPU devices (the multi-chip-without-a-cluster setup,
SURVEY.md section 4). Since jax is already imported before any conftest runs,
we re-exec pytest once with a scrubbed environment. Loaded via ``-p
tests.force_cpu`` in pytest.ini so the re-exec happens before test collection;
the capture manager is suspended first so the child's output reaches the
terminal.
"""

import os
import sys

_WANT_FLAG = "--xla_force_host_platform_device_count=8"


def _needs_reexec() -> bool:
    if os.environ.get("GGNN_TPU_TEST_REEXEC") == "1":
        return False
    if "jax" in sys.modules:
        import jax

        try:
            return jax.default_backend() != "cpu" or len(jax.devices()) < 8
        except Exception:
            return True
    return (
        os.environ.get("JAX_PLATFORMS") != "cpu"
        or _WANT_FLAG not in os.environ.get("XLA_FLAGS", "")
    )


def pytest_load_initial_conftests(early_config, parser, args):
    if not _needs_reexec():
        return
    env = dict(os.environ)
    env["GGNN_TPU_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _WANT_FLAG).strip()
    # drop sitecustomize hooks that pre-import jax bound to a TPU tunnel
    path = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join(path)

    capman = early_config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
            capman.stop_global_capturing()
        except Exception:
            pass
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
