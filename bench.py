"""Benchmark: batched cart-pole swing-up solves per second per chip.

The driver metric (BASELINE.json): "batched solves/sec per chip on
cart-pole swing-up; iters to 1e-6 KKT residual".  This benchmark builds the
cart-pole swing-up OCP (Kelly 2017; reference example
``examples/cart_pole_swing_up/cart_pole_swing_up_explicit.py``), transcribes
it on the default mesh (K=10, n=4 -> N=31 nodes), and solves batches of
instances with perturbed initial states (MPC-style replanning workload)
using the on-device condensed-space interior-point solver under ``vmap``.

Measurement: sustained throughput over several back-to-back chunks of
fresh (distinct-data) instances — chunk size 256 sits at the measured
throughput optimum: per-instance-per-iteration cost is flat in batch
size on the chip, so larger batches only lengthen the while-loop
straggler tail (the batch runs until its LAST instance converges).

Solver configuration (the TPU-native fast path, see
``pycollo_tpu/solver/ipm.py``):
- ``kkt_precision="mixed"``: f32 condensed-matrix factorization via the
  lane-vectorized Pallas diagonal-block Cholesky
  (``pycollo_tpu/ops/block_chol.py``) + MXU block algebra, with the
  step refined against the UNREGULARIZED coupled KKT system by
  right-preconditioned GMRES — the v5e has no native f64 (emulation
  measured at ~97x on this workload).
- ``eval_dtype="f32"``: Jacobian/Hessian block assembly in f32; the
  residuals, the J^T lam VJP, the iterate state, and the reported KKT
  error stay f64, so every solve is still certified at 1e-6 in f64.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}

The baseline (BASELINE.md) is the driver target of >= 1000 batched
solves/sec per host; the reference itself publishes no speed numbers
(its stack solves ONE instance per process via IPOPT+MUMPS,
``/root/reference/pycollo/backend.py:1695-1711``).
"""

import json
import sys
import time

import numpy as np

CHUNK = 256
N_CHUNKS = 4


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
    linear_solver = sys.argv[2] if len(sys.argv) > 2 else "condensed-cholesky"
    problem.settings.linear_solver = linear_solver
    problem.initialise()
    it = problem.backend.mesh_iterations[0]

    from pycollo_tpu.solver.ipm import IPMOptions
    if linear_solver == "block-banded":
        # Structured path: f64 banded-arrowhead factorization (see
        # solver/banded.py); scored separately via `bench.py <B> block-banded`.
        it.build_solver(IPMOptions(tol=1e-6, max_iter=80))
    else:
        it.build_solver(IPMOptions(
            tol=1e-6, max_iter=80, kkt_precision="mixed", dc_floor=1e-7,
            dense_gmres_iters=12, eval_dtype="f32"))
    solver = it._solver

    B = int(sys.argv[1]) if len(sys.argv) > 1 else CHUNK
    lay = it.layout
    pl = lay.phases[0]

    def make_chunk(seed):
        # Perturbed initial states: q1_0 in [-0.25, 0.25], q2_0 in
        # [-0.3, 0.3] (pinned entries of theta -> per-instance).
        rng = np.random.default_rng(seed)
        theta = np.tile(it.theta_default, (B, 1))
        theta[:, pl.y_off + 0 * pl.N] = rng.uniform(-0.25, 0.25, B)
        theta[:, pl.y_off + 1 * pl.N] = rng.uniform(-0.3, 0.3, B)
        return jnp.asarray(theta)

    x0_j = jnp.asarray(np.tile(it.xs_guess, (B, 1)))
    batched = jax.jit(jax.vmap(solver))

    # Warm-up / compile on a chunk NOT reused in the timed run (the
    # axon dispatch layer caches same-argument repeat dispatches).
    t0 = time.perf_counter()
    res = batched(x0_j, make_chunk(1000))
    res.x.block_until_ready()
    compile_time = time.perf_counter() - t0

    chunks = [make_chunk(k) for k in range(N_CHUNKS)]
    results = []
    t0 = time.perf_counter()
    for th in chunks:
        results.append(batched(x0_j, th))
    results[-1].x.block_until_ready()
    elapsed = time.perf_counter() - t0

    conv = float(np.mean([np.asarray(r.converged).mean() for r in results]))
    iters = float(np.mean([np.asarray(r.iterations).mean()
                           for r in results]))
    kkt99 = float(np.quantile(np.concatenate(
        [np.asarray(r.kkt_error) for r in results]), 0.99))
    solves_per_sec = (N_CHUNKS * B) / elapsed

    print(json.dumps({
        "metric": "batched cart-pole swing-up solves/sec per chip "
                  "(KKT tol 1e-6)",
        "value": round(solves_per_sec, 2),
        "unit": "solves/sec",
        "vs_baseline": round(solves_per_sec / 1000.0, 4),
        "detail": {
            "chunk_size": B,
            "n_chunks": N_CHUNKS,
            "total_wall_s": round(elapsed, 4),
            "compile_s": round(compile_time, 2),
            "converged_fraction": round(conv, 4),
            "mean_ipm_iterations": round(iters, 2),
            "kkt_error_p99": kkt99,
            "linear_solver": linear_solver,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
