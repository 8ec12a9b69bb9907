"""Complex linear algebra on backends without native complex factorizations.

The TPU backend implements f32 SVD/eigh but not their complex variants
(probed empirically; complex svd/eigh raise UNIMPLEMENTED). The classical
workaround embeds a complex matrix M = A + iB as the real matrix

    K = [[A, -B],
         [B,  A]],

the matrix of the C-linear map viewed over R. K commutes with the complex
structure J = [[0, -I], [I, 0]]; every singular value / eigenvalue of M
appears in K twice, spectral subspaces of K are J-invariant realifications
of the complex ones, and any real vector w = (x; y) in such a subspace maps
to a valid complex vector z = x + iy of the corresponding complex subspace
(J w maps to i z).

The delicate part is selecting a COMPLEX-independent half basis out of the
real eigen/singular vectors: inside exactly degenerate clusters the real
solver may return J-paired vectors (z-images differing only by phase). The
robust selection used here: take ALL 2k real candidates, remix them with a
fixed random matrix masked to eigenvalue clusters (the complex Gram between
different clusters vanishes by J-invariance, so later whitening cannot leak
between subspaces), and orthonormalize with a scaled Newton-Schulz
iteration (matmuls only).

For the SVD, only the right factor V is extracted this way; U = M V / s
follows with automatically consistent phases, and singular values come
unsquared from the real SVD — so the resolution is eps * s_max, not the
sqrt(eps) floor of a Gram route.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Test hook: force the real-embedding path even on CPU.
FORCE_EMBEDDING = False


def _native_complex_linalg() -> bool:
    if FORCE_EMBEDDING:
        return False
    return jax.default_backend() == "cpu"


def _embed(M: jax.Array) -> jax.Array:
    A, B = M.real, M.imag
    return jnp.block([[A, -B], [B, A]])


def _cluster_remix(candidates: jax.Array, vals2: jax.Array, vals_sel: jax.Array,
                   dtype, tol_scale) -> jax.Array:
    """Randomly remix 2k complex candidate vectors within value clusters and
    Newton-Schulz-whiten to an orthonormal [d, k] basis.

    candidates: [d, 2k]; vals2: [2k] values of each candidate; vals_sel: [k]
    target values per output slot (ordering preserved).
    """
    d, two_k = candidates.shape
    k = vals_sel.shape[0]
    member = jnp.abs(vals2[:, None] - vals_sel[None, :]) <= tol_scale
    kr, ki = jax.random.split(jax.random.PRNGKey(1729))
    Om = (
        jax.random.normal(kr, (two_k, k), dtype=vals2.dtype)
        + 1j * jax.random.normal(ki, (two_k, k), dtype=vals2.dtype)
    ).astype(dtype)
    Z = candidates @ (Om * member.astype(dtype))
    G = Z.conj().T @ Z
    nrm = jnp.sqrt(jnp.linalg.norm(G)) + jnp.finfo(vals2.dtype).tiny
    Z = Z / nrm.astype(dtype)
    eye = jnp.eye(k, dtype=dtype)
    for _ in range(25):
        G = Z.conj().T @ Z
        Z = Z @ (1.5 * eye - 0.5 * G)
    return Z


def ceigh(H: jax.Array):
    """Hermitian eigendecomposition, ascending eigenvalues.

    Returns ``(lam [n] real, V [n, n])`` with H V = V diag(lam).
    """
    if not jnp.issubdtype(H.dtype, jnp.complexfloating) or _native_complex_linalg():
        return jnp.linalg.eigh(H)
    n = H.shape[0]
    lam2, W = jnp.linalg.eigh(_embed(H))  # ascending; clusters have even size
    lam = 0.5 * (lam2[0::2] + lam2[1::2])
    Z_all = (W[:n, :] + 1j * W[n:, :]).astype(H.dtype)  # co-isometry * sqrt2
    eps = jnp.finfo(lam2.dtype).eps
    scale = jnp.maximum(jnp.max(jnp.abs(lam2)), jnp.finfo(lam2.dtype).tiny)
    V = _cluster_remix(Z_all, lam2, lam, H.dtype, 64.0 * eps * scale)
    return lam, V


def csvd(M: jax.Array):
    """Reduced SVD ``M = U diag(s) Vh`` with descending s.

    Native on CPU / for real dtypes; real-embedding route elsewhere.
    Factor columns/rows whose singular value sits below the noise floor
    (16 eps s_max) are zeroed — they carry negligible weight.
    """
    if not jnp.issubdtype(M.dtype, jnp.complexfloating) or _native_complex_linalg():
        return jnp.linalg.svd(M, full_matrices=False)
    a, b = M.shape
    k = min(a, b)
    _, s2, Vhk = jnp.linalg.svd(_embed(M), full_matrices=False)
    s = s2[0::2]  # descending, one per duplicated pair
    # right-vector candidates: rows of Vhk mapped to complex b-vectors
    cand = (Vhk[:, :b] + 1j * Vhk[:, b:]).T.astype(M.dtype)  # [b, 2k]
    eps = jnp.finfo(s2.dtype).eps
    smax = jnp.maximum(s2[0], jnp.finfo(s2.dtype).tiny)
    V = _cluster_remix(cand, s2, s, M.dtype, 64.0 * eps * smax)  # [b, k]
    W = M @ V  # [a, k]
    s_out = jnp.linalg.norm(W, axis=0)
    floor = 16.0 * eps * smax
    keep = s_out > floor
    inv = jnp.where(keep, 1.0 / jnp.where(keep, s_out, 1.0), 0.0)
    U = W * inv[None, :].astype(M.dtype)
    Vh = jnp.where(keep[:, None], V.conj().T, 0.0)
    return U, s_out, Vh
