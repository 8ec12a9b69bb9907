"""Accuracy experiment (CPU, f32): compare device-SVD routes on matrices
with singular spectra spanning the f32 noise floor.

Routes:
  A  current: single Gram eigh  (squared conditioning)
  B  double-Gram: second Jacobi eigh on the graded Gram of B = U^H M
  C  one-sided Jacobi polish of B (2 sweeps)

Metrics vs f64 numpy SVD: max relative error of s in the kept range, and
truncation-reconstruction error at cutoff 1e-7 (relative squared).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from qilaplace_tpu.ops.jacobi import jacobi_eigh, onesided_polish, fast_sweeps


def make_matrix(a, b, smin_log=-8, seed=0):
    rng = np.random.default_rng(seed)
    k = min(a, b)
    s = np.logspace(0, smin_log, k)
    U, _ = np.linalg.qr(rng.normal(size=(a, k)) + 1j * rng.normal(size=(a, k)))
    V, _ = np.linalg.qr(rng.normal(size=(b, k)) + 1j * rng.normal(size=(b, k)))
    M = (U * s) @ V.conj().T
    return M.astype(np.complex64), s


def route_A(M, sweeps):
    _, U = jacobi_eigh(M @ jnp.conj(M.T), sweeps=sweeps)
    B = jnp.conj(U.T) @ M
    s = jnp.linalg.norm(B, axis=1)
    order = jnp.argsort(-s)
    return U[:, order], s[order], B[order]


def route_B(M, sweeps1, sweeps2):
    _, U = jacobi_eigh(M @ jnp.conj(M.T), sweeps=sweeps1)
    B = jnp.conj(U.T) @ M
    _, V2 = jacobi_eigh(B @ jnp.conj(B.T), sweeps=sweeps2)
    U = U @ V2
    B = jnp.conj(V2.T) @ B
    s = jnp.linalg.norm(B, axis=1)
    order = jnp.argsort(-s)
    return U[:, order], s[order], B[order]


def route_C(M, sweeps1, polish_sweeps):
    _, U = jacobi_eigh(M @ jnp.conj(M.T), sweeps=sweeps1)
    B = jnp.conj(U.T) @ M
    J, B = onesided_polish(B, sweeps=polish_sweeps)
    U = U @ J
    s = jnp.linalg.norm(B, axis=1)
    order = jnp.argsort(-s)
    return U[:, order], s[order], B[order]


def report(name, U, s, B, M64, s_true, cutoff=1e-7):
    U, s, B = np.asarray(U, np.complex128), np.asarray(s, np.float64), np.asarray(B, np.complex128)
    k = len(s_true)
    # s relative error where s_true above f32 tiny-floor
    mask = s_true > 1e-7 * s_true[0]
    rel = np.abs(s[: k][mask] - s_true[mask]) / s_true[mask]
    # truncation at cutoff (relative squared rule)
    p = s_true**2
    tail = np.concatenate([np.cumsum(p[::-1])[::-1][1:], [0.0]])
    rank = int(np.argmax(tail <= cutoff * p.sum()) + 1)
    Mr = (U[:, :rank]) @ B[:rank]
    err = np.linalg.norm(Mr - M64) / np.linalg.norm(M64)
    ideal = np.sqrt(tail[rank - 1] / p.sum())
    print(f"{name:28s} max rel s err {rel.max():9.2e}   trunc rank {rank} "
          f"recon err {err:9.2e} (ideal {ideal:9.2e})")


def main():
    for (a, b) in [(128, 256), (160, 1024)]:
        M, s_true = make_matrix(a, b)
        M64 = np.asarray(M, np.complex128)
        Mj = jnp.asarray(M)
        sw = fast_sweeps(a)
        print(f"--- M [{a},{b}], spectrum 1..1e-8, fast_sweeps={sw}")
        report("A: single Gram", *route_A(Mj, sw), M64, s_true)
        report("B: double Gram (sw,4)", *route_B(Mj, sw, 4), M64, s_true)
        report("B: double Gram (4,4)", *route_B(Mj, 4, 4), M64, s_true)
        report("C: one-sided polish (sw,2)", *route_C(Mj, sw, 2), M64, s_true)
        report("C: one-sided polish (4,2)", *route_C(Mj, 4, 2), M64, s_true)
        # tighter: all-significant spectrum (easy case, sanity)
        M2, s2 = make_matrix(a, b, smin_log=-3, seed=1)
        report("A (1..1e-3)", *route_A(jnp.asarray(M2), sw), np.asarray(M2, np.complex128), s2)
        report("B (1..1e-3)", *route_B(jnp.asarray(M2), 4, 4), np.asarray(M2, np.complex128), s2)


if __name__ == "__main__":
    main()
