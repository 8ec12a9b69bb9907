"""On-TPU numerical probes of the truncation primitives (no host complex).

1. jacobi_eigh_pallas vs the lax.scan reference on the same Hermitian
   matrix: eigenvalue diff + residual ||H V - V diag(lam)||.
2. truncated_svd (fast profile, sketched) cap-128 reconstruction error on a
   synthetic graded spectrum [512, 4096], vs the ideal tail.
3. range_split capture error on the same matrix at l=128 and l=256.
All numbers computed in-program, fetched as f32 scalars.
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
# without this every probe matmul (H construction, the residual/orthogonality
# MEASUREMENTS themselves) runs at bf16 on the TPU and floors at ~2e-3
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from qilaplace_tpu.ops.jacobi import (
    jacobi_eigh, jacobi_eigh_pallas, fast_sweeps,
)
from qilaplace_tpu.ops.truncation import (
    truncated_svd, range_split, sketch_matrix,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def crandn(key, shape):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, shape) +
            1j * jax.random.normal(k2, shape)).astype(jnp.complex64)


def graded(key, a, b, smin_log=-6.0):
    """[a, b] complex with log-spaced singular values 1..10^smin_log."""
    k1, k2 = jax.random.split(key)
    kk = min(a, b)
    s = jnp.logspace(0.0, smin_log, kk).astype(jnp.float32)
    U, _ = jnp.linalg.qr(crandn(k1, (a, kk)))
    V, _ = jnp.linalg.qr(crandn(k2, (b, kk)))
    return (U * s.astype(jnp.complex64)) @ jnp.conj(V.T), s


# ---- 1. pallas vs scan eigh ----
@jax.jit
def eigh_probe(key):
    m = 160
    A = crandn(key, (m, m))
    H = A @ jnp.conj(A.T)
    sw = fast_sweeps(m)
    lam_p, V_p = jacobi_eigh_pallas(H, sweeps=sw)
    lam_s, V_s = jacobi_eigh(H, sweeps=sw)
    res_p = jnp.linalg.norm(H @ V_p - V_p * lam_p[None, :].astype(H.dtype))
    res_s = jnp.linalg.norm(H @ V_s - V_s * lam_s[None, :].astype(H.dtype))
    scale = jnp.linalg.norm(H)
    dlam = jnp.max(jnp.abs(lam_p - lam_s)) / jnp.max(jnp.abs(lam_s))
    orth_p = jnp.linalg.norm(
        jnp.conj(V_p.T) @ V_p - jnp.eye(m, dtype=H.dtype)
    )
    return (dlam.astype(jnp.float32),
            (res_p / scale).real.astype(jnp.float32),
            (res_s / scale).real.astype(jnp.float32),
            orth_p.real.astype(jnp.float32))


d, rp, rs, op = (np.asarray(x) for x in eigh_probe(jax.random.PRNGKey(7)))
log(f"eigh m=160: dlam {d:.3e}  resid pallas {rp:.3e} scan {rs:.3e} "
    f"orth_defect pallas {op:.3e}")


# ---- 2/3. truncation primitives on graded [512, 4096] ----
@jax.jit
def trunc_probe(key):
    M, s = graded(key, 512, 4096)
    nrm = jnp.linalg.norm(M).real
    r = 128
    ideal = jnp.sqrt(jnp.sum(s[r:] ** 2)) / nrm

    U, sv, Vh, rank = truncated_svd(M, cutoff=1e-7, maxdim=r)
    Mr = (U * sv[None, :].astype(M.dtype)) @ Vh
    err_svd = jnp.linalg.norm(Mr - M).real / nrm

    om128 = sketch_matrix(jax.random.PRNGKey(5), 4096, 128, M.dtype)
    Q, R, _ = range_split(M, om128)
    err_r128 = jnp.linalg.norm(Q @ R - M).real / nrm

    om256 = sketch_matrix(jax.random.PRNGKey(5), 4096, 256, M.dtype)
    Q2, R2, _ = range_split(M, om256)
    err_r256 = jnp.linalg.norm(Q2 @ R2 - M).real / nrm
    return (ideal.astype(jnp.float32), err_svd.astype(jnp.float32),
            err_r128.astype(jnp.float32), err_r256.astype(jnp.float32),
            rank)


ideal, e_svd, e_r128, e_r256, rank = (
    np.asarray(x) for x in trunc_probe(jax.random.PRNGKey(3))
)
log(f"[512,4096] graded 1..1e-6: ideal cap128 {ideal:.3e}  "
    f"truncated_svd(fast) {e_svd:.3e} (rank {rank})  "
    f"range l=128 {e_r128:.3e}  range l=256 {e_r256:.3e}")

# same on CPU LAPACK for reference
cpu = jax.local_devices(backend="cpu")[0]
jax.config.update("jax_default_device", cpu)
ideal, e_svd, e_r128, e_r256, rank = (
    np.asarray(x) for x in jax.jit(trunc_probe)(jax.random.PRNGKey(3))
)
log(f"CPU reference:             ideal cap128 {ideal:.3e}  "
    f"truncated_svd {e_svd:.3e} (rank {rank})  "
    f"range l=128 {e_r128:.3e}  range l=256 {e_r256:.3e}")
