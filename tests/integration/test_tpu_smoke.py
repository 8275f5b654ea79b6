"""TPU device smoke tests (``@pytest.mark.tpu``).

The rest of the suite forces the CPU backend (``tests/conftest.py``), so
nothing CI-able ever touched the device the benchmarks are scored on.
These tests run a tiny batched cart-pole solve *in a subprocess* on the
default (TPU) JAX platform, asserting convergence and the objective on
real hardware.  They skip automatically when no TPU backend is
available (e.g. local CPU-only dev machines).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]

_SMOKE = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
dev = jax.devices()[0]
if dev.platform not in ("tpu", "axon") and "TPU" not in str(dev):
    print(json.dumps({"skip": f"no TPU, default device is {dev}"}))
    sys.exit(0)
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/examples")
import jax.numpy as jnp
from cart_pole_swing_up import build_problem

problem = build_problem()
problem.settings.console_out_progress = False
phase = problem.phases[0]
phase.mesh.number_mesh_sections = 4
phase.mesh.number_mesh_section_nodes = 4
problem.initialise()
it = problem.backend.mesh_iterations[0]
from pycollo_tpu.solver.ipm import IPMOptions
mode = sys.argv[1] if len(sys.argv) > 1 else "f64"
if mode == "mixed":
    # The scored bench configuration: f32 Pallas factorization + f32
    # assembly + f64 certification (see bench.py).
    it.build_solver(IPMOptions(tol=1e-6, max_iter=60,
                               kkt_precision="mixed", dc_floor=1e-7,
                               dense_gmres_iters=12, eval_dtype="f32"))
else:
    it.build_solver(IPMOptions(tol=1e-6, max_iter=60))

B = 4
rng = np.random.default_rng(0)
pl = it.layout.phases[0]
theta = np.tile(it.theta_default, (B, 1))
theta[:, pl.y_off] = rng.uniform(-0.1, 0.1, B)
x0 = np.tile(it.xs_guess, (B, 1))
res = jax.jit(jax.vmap(it._solver))(jnp.asarray(x0), jnp.asarray(theta))
res.x.block_until_ready()
print(json.dumps({
    "device": str(dev),
    "converged": int(np.asarray(res.converged).sum()),
    "B": B,
    "objectives": (np.asarray(res.f) / it.w).tolist(),
}))
"""


@pytest.mark.tpu
@pytest.mark.parametrize("mode", ["f64", "mixed"])
def test_tpu_batched_cart_pole_smoke(mode):
    """Tiny batched cart-pole solve on the real device.

    Guards against device-only failures (f64 emulation, program-size
    faults, Pallas/Mosaic legalization) that the CPU-forced suite
    cannot see — both round-1 and round-2 benchmark crashes would have
    been caught here.  ``mode="mixed"`` exercises the scored bench
    configuration (f32 Pallas factorization + f32 assembly + f64
    certification) on the actual MXU.
    """
    env = dict(os.environ)
    # Drop the CPU-forcing knobs the test harness may have set.
    env.pop("JAX_PLATFORM_NAME", None)
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c", _SMOKE % {"repo": str(REPO)}, mode],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=str(REPO))
    if proc.returncode != 0:
        if "Backend" in proc.stderr and "known backends" in proc.stderr:
            pytest.skip("no TPU backend available")
        pytest.fail(f"TPU smoke subprocess failed:\n{proc.stderr[-4000:]}")
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    if "skip" in out:
        pytest.skip(out["skip"])
    assert out["converged"] == out["B"], out
    # Tiny-mesh objective is within a few percent of the converged
    # cart-pole work integral (58.32 on the full mesh).
    for obj in out["objectives"]:
        assert 40.0 < obj < 80.0, out
