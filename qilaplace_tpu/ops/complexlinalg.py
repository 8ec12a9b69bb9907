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

The SVD uses a complete Gram eigenbasis of the smaller side: correctness
(U (U^H M) == M) holds for ANY complete orthonormal basis, so the TPU
eigh's accuracy limits only truncation optimality, never reconstruction;
singular values are read off unsquared as factor column norms and sorted
explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qilaplace_tpu.utils.config import highest_precision
import numpy as np

# Test hook: force the real-embedding path even on CPU.
FORCE_EMBEDDING = False


def _native_complex_linalg() -> bool:
    if FORCE_EMBEDDING:
        return False
    # honor an explicit default-device override (e.g. setup phases pinned to
    # the host CPU while a TPU backend is primary)
    dev = jax.config.jax_default_device
    if dev is not None and getattr(dev, "platform", None) == "cpu":
        return True
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
    # Data-driven cluster tolerance: the observed within-pair spread measures
    # the eigensolver's duplicate noise (clusters have even size, so adjacent
    # pairing never straddles a true gap). A fixed eps-based tol can fall
    # BELOW the solver noise, leaving slots with empty masks (=> zero
    # columns); guard with the measured spread and always include each
    # slot's own adjacent pair.
    pair_spread = jnp.max(jnp.abs(vals2[0::2] - vals2[1::2]))
    tol = jnp.maximum(tol_scale, 16.0 * pair_spread)
    member = jnp.abs(vals2[:, None] - vals_sel[None, :]) <= tol
    own = (jnp.arange(two_k)[:, None] // 2) == jnp.arange(k)[None, :]
    member = member | own
    kr, ki = jax.random.split(jax.random.PRNGKey(1729))
    Om = (
        jax.random.normal(kr, (two_k, k), dtype=vals2.dtype)
        + 1j * jax.random.normal(ki, (two_k, k), dtype=vals2.dtype)
    ).astype(dtype)
    Z = candidates @ (Om * member.astype(dtype))
    G = Z.conj().T @ Z
    # spectral-norm upper bound (hermitian): max absolute row sum — tighter
    # than Frobenius, so Newton-Schulz recovers small directions faster
    bound = jnp.max(jnp.sum(jnp.abs(G), axis=1)) + jnp.finfo(vals2.dtype).tiny
    Z = Z / jnp.sqrt(bound).astype(dtype)
    eye = jnp.eye(k, dtype=dtype)
    for _ in range(25):
        G = Z.conj().T @ Z
        Z = Z @ (1.5 * eye - 0.5 * G)
    return Z


@highest_precision
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


@highest_precision
def csvd(M: jax.Array):
    """Reduced SVD ``M = U diag(s) Vh`` with descending s.

    Native on CPU / for real dtypes; complete-Gram-basis route elsewhere
    (see module docstring). Factor rows/columns whose singular value sits
    below the noise floor are zeroed — they carry negligible weight.
    """
    if not jnp.issubdtype(M.dtype, jnp.complexfloating) or _native_complex_linalg():
        return jnp.linalg.svd(M, full_matrices=False)
    a, b = M.shape

    # Complete-Gram-basis route. With U a COMPLETE orthonormal basis of the
    # smaller side, U (U^H M) == M holds exactly no matter how accurate the
    # eigenvectors are — eigen quality only affects how diagonal the split
    # is (truncation optimality), never correctness. This matters because
    # the TPU f32 eigh leaves O(1) interior residuals on structured spectra;
    # a Rayleigh-Ritz re-diagonalization pass (nearly-diagonal input, which
    # the Jacobi solver handles sharply) restores diagonality, and singular
    # values are read off unsquared as column norms and explicitly sorted.
    def _basis(G):
        G = 0.5 * (G + G.conj().T)
        _, Q = ceigh(G)
        T = Q.conj().T @ (G @ Q)
        T = 0.5 * (T + T.conj().T)
        _, Q2 = ceigh(T)
        return Q @ Q2

    eps = jnp.finfo(M.real.dtype).eps
    if a <= b:
        U = _basis(M @ M.conj().T)  # [a, a] complete
        B = U.conj().T @ M  # rows are s_j v_j^H; U @ B == M exactly
        s = jnp.linalg.norm(B, axis=1)
        order = jnp.argsort(-s)
        U = U[:, order]
        B = B[order]
        s = s[order]
        smax = jnp.maximum(s[0], jnp.finfo(s.dtype).tiny)
        keep = s > 4.0 * eps * smax
        inv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
        Vh = B * inv[:, None].astype(M.dtype)
        return U, s, Vh
    V = _basis(M.conj().T @ M)  # [b, b] complete
    B = M @ V  # columns are s_j u_j; B @ V^H == M exactly
    s = jnp.linalg.norm(B, axis=0)
    order = jnp.argsort(-s)
    V = V[:, order]
    B = B[:, order]
    s = s[order]
    smax = jnp.maximum(s[0], jnp.finfo(s.dtype).tiny)
    keep = s > 4.0 * eps * smax
    inv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
    U = B * inv[None, :].astype(M.dtype)
    return U, s, V.conj().T
