"""Per-eigh wall time vs m on the TPU, device-resident inputs.

Times K chained jacobi_eigh_pallas solves in ONE jitted program (each feeds
the next, so XLA cannot parallelize them) — per-eigh latency = total / K.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from qilaplace_tpu.ops.jacobi import fast_sweeps, jacobi_eigh_pallas


def log(*a):
    print(*a, file=sys.stderr, flush=True)


K = 8
for m in (64, 128, 160, 256, 320):
    sw = fast_sweeps(m)

    @jax.jit
    def chain(Hr, Hi, sw=sw):
        H = Hr + 1j * Hi
        acc = jnp.float32(0.0)
        for _ in range(K):
            lam, V = jacobi_eigh_pallas(H, sweeps=sw)
            acc = acc + lam[0].astype(jnp.float32)
            H = H + (acc * 1e-20).astype(H.dtype)  # serialize
        return acc

    rng = np.random.default_rng(0)
    A = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    H = A @ A.conj().T
    Hr = jax.device_put(np.float32(H.real))
    Hi = jax.device_put(np.float32(H.imag))
    np.asarray(chain(Hr, Hi))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(chain(Hr, Hi))
        ts.append(time.perf_counter() - t0)
    t = np.median(ts)
    per = (t) / K
    rounds = sw * (m - 1)
    log(f"m={m:4d} sw={sw}: {1000*per:7.1f} ms/eigh  "
        f"({1e6*per/rounds:6.1f} us/round, {rounds} rounds)")
