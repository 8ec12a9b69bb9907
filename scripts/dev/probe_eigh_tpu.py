"""Eigh quality vs size on the real TPU: known graded spectrum.

For m in {64, 128, 160, 256, 320}: H = U diag(lam) U^H with lam log-spaced
1..1e-8 and U an exact unitary (from f64-on-CPU QR, shipped as f32 re/im).
Measures, per (m, sweeps profile):
  rel_big  = max rel eigenvalue error over lam >= 1e-3 * lam_max
  rel_small= max rel eigenvalue error over the rest (graded-accuracy probe)
  orth     = || V^H V - I ||_F
  resid    = || H V - V diag || / ||H||
"""
import os
import sys

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

from qilaplace_tpu.ops.jacobi import (
    default_sweeps,
    fast_sweeps,
    jacobi_eigh_pallas,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_H(m, seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    Q, _ = np.linalg.qr(A)  # f64 exact-ish unitary
    lam = np.logspace(0.0, -8.0, m)
    H = (Q * lam) @ Q.conj().T
    H = 0.5 * (H + H.conj().T)
    return H.real.astype(np.float32), H.imag.astype(np.float32), lam


for m in (64, 128, 160, 256, 320):
    Hr, Hi, lam_true = make_H(m, 11)
    lam_ref = np.sort(lam_true)

    for name, sw in (("fast", fast_sweeps(m)),
                     ("default", default_sweeps(m)),
                     ("dbl", default_sweeps(m) + 4)):
        @jax.jit
        def probe(Hr, Hi, sw=sw):
            H = Hr + 1j * Hi
            lam, V = jacobi_eigh_pallas(H, sweeps=sw)
            eye = jnp.eye(H.shape[0], dtype=H.dtype)
            orth = jnp.linalg.norm(jnp.conj(V.T) @ V - eye)
            resid = jnp.linalg.norm(
                H @ V - V * lam[None, :].astype(H.dtype)
            ) / jnp.linalg.norm(H)
            return lam, orth.real.astype(jnp.float32), \
                resid.real.astype(jnp.float32)

        lam, orth, resid = probe(Hr, Hi)
        lam = np.asarray(lam, np.float64)
        rel = np.abs(lam - lam_ref) / np.abs(lam_ref)
        big = lam_ref >= 1e-3 * lam_ref[-1]
        log(f"m={m:4d} {name:8s} sw={sw:2d}: rel_big {rel[big].max():.3e} "
            f"rel_small {rel[~big].max():.3e} orth {float(orth):.3e} "
            f"resid {float(resid):.3e}")
