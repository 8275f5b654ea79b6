"""Benchmark: batched cart-pole swing-up solves per second per chip.

The driver metric (BASELINE.json): "batched solves/sec per chip on
cart-pole swing-up; iters to 1e-6 KKT residual".  This benchmark builds the
cart-pole swing-up OCP (Kelly 2017; reference example
``examples/cart_pole_swing_up/cart_pole_swing_up_explicit.py``), transcribes
it on the default mesh (K=10, n=4 -> N=31 nodes), and solves a batch of
instances with perturbed initial states (MPC-style replanning workload)
using the on-device condensed-space interior-point solver under ``vmap``.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}

The baseline (BASELINE.md) is the driver target of >= 1000 batched
solves/sec per host; the reference itself publishes no speed numbers.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, "examples")
    from cart_pole_swing_up import build_problem

    problem = build_problem()
    problem.settings.console_out_progress = False
    problem.settings.nlp_tolerance = 1e-6   # driver metric: 1e-6 KKT
    # Default: dense condensed Cholesky — the configuration measured to
    # converge on the chip (block-banded compiles and runs on TPU but
    # currently stalls at max_iter there; it is CPU-verified only, see
    # tests/unit/test_block_kkt.py).  Override: bench.py <B> block-banded
    problem.settings.linear_solver = (
        sys.argv[2] if len(sys.argv) > 2 else "condensed-cholesky")
    problem.initialise()
    it = problem.backend.mesh_iterations[0]

    from pycollo_tpu.solver.ipm import IPMOptions
    it.build_solver(IPMOptions(tol=1e-6, max_iter=60))
    solver = it._solver

    # Batch of perturbed initial states: q1_0 in [-0.25, 0.25],
    # q2_0 in [-0.3, 0.3] (pinned entries of theta -> per-instance).
    # Largest batch verified to run AND converge on the chip this round
    # (B=128/512 hit a TPU runtime fault in the giant fused IPM program;
    # B=64: converged 64/64).  Scale up as the compile-size cliff moves.
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    lay = it.layout
    pl = lay.phases[0]
    theta = np.tile(it.theta_default, (B, 1))
    theta[:, pl.y_off + 0 * pl.N] = rng.uniform(-0.25, 0.25, B)   # q1(t0)
    theta[:, pl.y_off + 1 * pl.N] = rng.uniform(-0.3, 0.3, B)     # q2(t0)
    x0 = np.tile(it.xs_guess, (B, 1))

    batched = jax.jit(jax.vmap(solver))
    theta_j = jnp.asarray(theta)
    x0_j = jnp.asarray(x0)

    # Warm-up / compile.
    t0 = time.perf_counter()
    res = batched(x0_j, theta_j)
    res.x.block_until_ready()
    compile_time = time.perf_counter() - t0

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        res = batched(x0_j, theta_j)
        res.x.block_until_ready()
    elapsed = (time.perf_counter() - t0) / n_rep

    conv = float(np.asarray(res.converged).mean())
    iters = float(np.asarray(res.iterations).mean())
    solves_per_sec = B / elapsed

    print(json.dumps({
        "metric": "batched cart-pole swing-up solves/sec per chip "
                  "(KKT tol 1e-6)",
        "value": round(solves_per_sec, 2),
        "unit": "solves/sec",
        "vs_baseline": round(solves_per_sec / 1000.0, 4),
        "detail": {
            "batch_size": B,
            "batch_wall_s": round(elapsed, 4),
            "compile_s": round(compile_time, 2),
            "converged_fraction": round(conv, 4),
            "mean_ipm_iterations": round(iters, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
