"""TPU timing: Pallas batched-Cholesky kernel vs XLA cholesky+inverse.

Run on a TPU host::

    python -m pycollo_tpu.ops.bench_chol

Prints one line per block size; the measured table is recorded in the
``ops/block_chol.py`` module docstring.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from .block_chol import batched_chol_inv, chol_inv_reference

    B = 4096
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}, batch={B}")
    for n in (8, 16, 24, 32):
        M = rng.standard_normal((B, n, n))
        A = jnp.asarray(M @ np.swapaxes(M, -1, -2) + 0.5 * np.eye(n),
                        dtype=jnp.float32)

        kern = jax.jit(lambda a: batched_chol_inv(a, interpret=False))
        ref = jax.jit(chol_inv_reference)

        o1 = kern(A).block_until_ready()
        o2 = ref(A).block_until_ready()
        err = float(jnp.max(jnp.abs(o1 - o2)))

        def med_ms(f, a, inner=20):
            # Queue `inner` async calls per sample so the host->device
            # dispatch latency amortizes out of the per-call time.
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(inner):
                    o = f(a)
                o.block_until_ready()
                ts.append((time.perf_counter() - t0) / inner)
            return 1e3 * sorted(ts)[2]

        t_k = med_ms(kern, A)
        t_r = med_ms(ref, A)
        print(f"n={n:3d}  pallas={t_k:8.3f} ms  xla={t_r:8.3f} ms  "
              f"speedup={t_r / t_k:5.1f}x  max|diff|={err:.2e}")


if __name__ == "__main__":
    main()
