"""Complex linear algebra on backends without native complex factorizations.

The tunneled TPU backend implements no complex factorizations at all, and
its native f32 ``eigh`` (QDWH) only converges extreme eigenpairs on
structured spectra. Both are replaced by the matmul-only Jacobi eigensolver
(ops.jacobi — a Pallas kernel on TPU, a ``lax.scan`` reference elsewhere),
which runs natively on complex data:

* ``ceigh`` — Hermitian eigendecomposition: LAPACK on CPU, Jacobi on device.
* ``csvd`` — complete-Gram SVD: with U a COMPLETE orthonormal eigenbasis of
  the smaller-side Gram matrix, U (U^H M) == M holds for ANY unitary U, so
  reconstruction is exact regardless of eigenvector accuracy — and the
  Jacobi V is exactly unitary by construction. Singular values are read off
  unsquared as factor column norms and sorted explicitly.
* ``chol_qr`` — orthonormalization via complex Cholesky, computed EXACTLY
  through the native real Cholesky of the interleaved real embedding: for
  Hermitian positive-definite G, the real Cholesky factor of
  iota(G) (iota: each complex entry -> 2x2 block [[re, -im], [im, re]]) is
  iota(L) of the complex factor L, because iota(L) is lower-triangular with
  positive diagonal (complex Cholesky diagonals are real positive) and the
  real factor is unique. The same argument gives complex triangular solves.

This layer is the TPU-native analog of the LAPACK calls behind ITensors'
``svd``/``qr``/``eigen`` in the reference (src/linalg/rsvd.jl:83-111 and
every compression sweep).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qilaplace_tpu.ops.jacobi import jacobi_eigh, jacobi_eigh_pallas
from qilaplace_tpu.utils.config import highest_precision

# Test hook: force the device (non-LAPACK) path even on CPU.
FORCE_DEVICE_PATH = False


def _native_complex_linalg() -> bool:
    if FORCE_DEVICE_PATH:
        return False
    # honor an explicit default-device override (e.g. setup phases pinned to
    # the host CPU while a TPU backend is primary)
    dev = jax.config.jax_default_device
    if dev is not None and getattr(dev, "platform", None) == "cpu":
        return True
    return jax.default_backend() == "cpu"


def _device_eigh(H: jax.Array, *, sweeps: int | None = None):
    """Jacobi eigh on the device path: Pallas kernel on real accelerators,
    the lax.scan reference under CPU emulation/tests. ``sweeps`` overrides
    the per-size default (loose-cutoff truncations request fewer)."""
    m = H.shape[-1]
    if (
        jax.default_backend() != "cpu"
        and m % 2 == 0
        and m <= 512
        and H.real.dtype == jnp.float32
    ):
        return jacobi_eigh_pallas(H, sweeps=sweeps)
    return jacobi_eigh(H, sweeps=sweeps)


@highest_precision
def ceigh(H: jax.Array, *, sweeps: int | None = None):
    """Hermitian eigendecomposition, ascending eigenvalues.

    Returns ``(lam [..., n] real, V [..., n, n])`` with H V = V diag(lam).
    ``sweeps`` tunes the device Jacobi solver only (ignored on LAPACK).
    """
    if _native_complex_linalg():
        return jnp.linalg.eigh(H)
    return _device_eigh(H, sweeps=sweeps)


@highest_precision
def csvd(M: jax.Array):
    """Reduced SVD ``M = U diag(s) Vh`` with descending s.

    Native on CPU; complete-Gram-basis route with a graded-Gram refinement
    pass elsewhere (see ops.truncation._gram_svd for the accuracy analysis).
    Factor rows/columns whose singular value sits below the working-precision
    noise floor are zeroed — they carry negligible weight.
    """
    if _native_complex_linalg():
        return jnp.linalg.svd(M, full_matrices=False)
    from qilaplace_tpu.ops.truncation import _gram_svd

    return _gram_svd(M)


# ------------------- interleaved-embedding Cholesky QR -----------------------

def _interleave(G: jax.Array) -> jax.Array:
    """iota(G): [m, m] complex -> [2m, 2m] real with 2x2 blocks
    [[re, -im], [im, re]] per entry."""
    m = G.shape[-1]
    Gr, Gi = jnp.real(G), jnp.imag(G)
    T = jnp.stack(
        [jnp.stack([Gr, -Gi], axis=-1), jnp.stack([Gi, Gr], axis=-1)],
        axis=-3,
    )  # [..., m, 2, m, 2] with T[i, a, j, b] = block(a, b) at (i, j)
    return T.reshape(*G.shape[:-2], 2 * m, 2 * m)


def _deinterleave(K: jax.Array, dtype) -> jax.Array:
    """Extract the complex matrix from an iota-structured real [2m, 2m]."""
    return (K[..., 0::2, 0::2] + 1j * K[..., 1::2, 0::2]).astype(dtype)


def cchol(G: jax.Array) -> jax.Array:
    """Complex Cholesky factor L (lower, real positive diagonal) of a
    Hermitian positive-definite G, via the native REAL Cholesky of the
    interleaved embedding (exact by uniqueness — see module docstring)."""
    if not jnp.issubdtype(G.dtype, jnp.complexfloating):
        return jnp.linalg.cholesky(G)
    if _native_complex_linalg():
        return jnp.linalg.cholesky(G)
    K = jnp.linalg.cholesky(_interleave(G))
    return _deinterleave(K, G.dtype)


def ctri_inv(L: jax.Array) -> jax.Array:
    """Inverse of a (complex) lower-triangular matrix via the native real
    triangular solve on the interleaved embedding."""
    if (
        not jnp.issubdtype(L.dtype, jnp.complexfloating)
        or _native_complex_linalg()
    ):
        eye = jnp.eye(L.shape[-1], dtype=L.dtype)
        return jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    K = _interleave(L)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    Z = jax.scipy.linalg.solve_triangular(K, eye, lower=True)
    return _deinterleave(Z, L.dtype)


@highest_precision
def chol_qr(Y: jax.Array, *, passes: int = 2, shift: float | None = None):
    """Orthonormalize the columns of Y [a, l] by (shifted) CholeskyQR.

    Near rank deficiency is regularized by a diagonal shift scaled to the
    FULL Gram trace (an upper bound on lambda_max — Cholesky's elimination
    error scales with lambda_max, so a mean-diagonal shift breaks down on
    concentrated spectra), plus an absolute floor so an exactly-zero Y maps
    to Q == 0 instead of the NaN Cholesky of the zero matrix. A second pass
    restores orthonormality of the well-conditioned block (CholeskyQR2).

    CONTRACT: Y must have numerically full column rank. On rank-deficient Y
    the whitening amplifies noise directions (finite, but far from
    orthonormal) — use :func:`gram_orthonormalize` there; every sketch/zip
    path does.
    """
    l = Y.shape[-1]
    if shift is None:
        shift = 16.0 * l * float(jnp.finfo(Y.real.dtype).eps)
    floor = float(np.finfo(np.dtype(Y.real.dtype.name)).tiny) * 1e6
    Q = Y
    for _ in range(passes):
        G = jnp.conj(Q.T) @ Q
        tr = jnp.trace(G).real  # >= lambda_max
        G = G + jnp.maximum(shift * tr, floor).astype(G.dtype) * jnp.eye(
            l, dtype=G.dtype
        )
        L = cchol(G)
        W = ctri_inv(L)
        Q = Q @ jnp.conj(W.T)
    return Q


@highest_precision
def gram_orthonormalize(Y: jax.Array, *, eps: float | None = None,
                        sweeps: int | None = None, ns_steps: int = 2):
    """Orthonormal basis of range(Y) via the Gram eigendecomposition,
    padding- and rank-deficiency-safe.

    Returns ``(Q, rank)`` with Q [a, l]; columns at index >= rank are
    EXACTLY zero. The eigenbasis comes from :func:`ceigh` (LAPACK on CPU,
    the exactly-unitary Jacobi solver on device), so whitening the valid
    block is stable and null directions are masked outright instead of
    being amplified — the failure mode of (shifted) CholeskyQR on the
    rank-deficient matrices every zip-up/sketch step produces. Two
    Newton-Schulz steps then restore orthonormality to working precision
    (the single whitening pass inherits the Gram matrix's squared
    conditioning; see the inline note).
    """
    a, l = Y.shape
    if eps is None:
        eps = float(jnp.finfo(Y.real.dtype).eps)
    tol = eps * l
    G = Y.conj().T @ Y
    lam, V = ceigh(G, sweeps=sweeps)  # ascending
    lam = jnp.maximum(lam.real[::-1], 0.0)
    V = V[:, ::-1]
    lam_max = jnp.maximum(lam[0], jnp.finfo(lam.dtype).tiny)
    keep = lam > tol * lam_max
    rank = jnp.sum(keep).astype(jnp.int32)
    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, lam, 1.0)), 0.0)
    Q = Y @ (V * inv_sqrt[None, :].astype(V.dtype))
    Q = jnp.where(keep[None, :], Q, 0.0)
    # Second pass: the whitened block's orthonormality defect E = Q^H Q - I
    # is O(eps * kappa(valid block)^2) <= O(1/l) by the mask threshold, so
    # two Newton-Schulz steps Q <- Q (3I - Q^H Q)/2 (quadratic: E -> E^2)
    # reach working precision at the cost of four matmuls — replacing the
    # second full eigensolve of the previous two-pass scheme. Masked columns
    # are exact zeros and stay exact zeros under right-multiplication.
    eye = jnp.eye(l, dtype=Q.dtype)
    for _ in range(ns_steps):
        Q = Q @ (1.5 * eye - 0.5 * (Q.conj().T @ Q))
    Q = jnp.where(keep[None, :], Q, 0.0)
    return Q, rank
