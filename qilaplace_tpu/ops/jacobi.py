"""Batched Hermitian Jacobi eigensolver — matmul-only, TPU-exact.

The tunneled TPU backend's native f32 ``eigh`` (QDWH-based) only converges
extreme eigenpairs on structured spectra (see CLAUDE.md), and complex
factorizations are UNIMPLEMENTED outright. This module provides the
replacement used by every on-device factorization: a cyclic parallel-order
(Brent–Luk round-robin) two-sided Jacobi eigensolver that

* works natively on complex (and real) Hermitian matrices — no real
  embedding, so no J-paired-eigenvector selection problem;
* produces an EXACTLY unitary eigenvector matrix by construction (a product
  of elementary unitary rotations), independent of convergence — the
  property the complete-Gram SVD route (ops.complexlinalg.csvd) relies on;
* is built from nothing but diagonal-block gathers and [m, m] matmuls, so
  it vmaps/batches onto the MXU and jits into a single ``lax.scan``.

Each round applies m/2 independent 2x2 rotations on adjacent position pairs
(2i, 2i+1) as one block-diagonal unitary Q (an [m, m] matmul pair), then
permutes positions with the static tournament rotation; m-1 rounds visit
every index pair exactly once (one sweep). Convergence is quadratic;
``sweeps`` is static so the whole solve compiles once.

This is the TPU-native analog of the LAPACK ``syevj``-class solvers backing
the reference's ITensors ``svd``/``eigen`` calls (reference
src/linalg/rsvd.jl:97-111 and every compression sweep).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _tournament_sigma(m: int) -> tuple:
    """Static position permutation for the Brent-Luk tournament.

    Positions pair as (2i, 2i+1). Returns sigma with
    ``arrangement_next[p] = arrangement[sigma[p]]``; applying it m-1 times
    cycles every pair through some position pair exactly once and returns
    to the identity arrangement.
    """
    if m % 2:
        raise ValueError("tournament needs even m")
    c = m // 2
    # pos -> round-robin list index: pair i = (L[i], L[m-1-i])
    pi = np.empty(m, dtype=np.int64)
    for i in range(c):
        pi[2 * i] = i
        pi[2 * i + 1] = m - 1 - i
    pi_inv = np.argsort(pi)
    # list rotation: L'[0] = L[0], L'[1] = L[m-1], L'[j] = L[j-1]
    rho = np.empty(m, dtype=np.int64)
    rho[0] = 0
    rho[1] = m - 1
    rho[2:] = np.arange(1, m - 1)
    sigma = pi_inv[rho[pi]]
    # verify: m-1 rounds cover all pairs and return to start
    arr = np.arange(m)
    seen = set()
    for _ in range(m - 1):
        for i in range(c):
            a, b = int(arr[2 * i]), int(arr[2 * i + 1])
            seen.add((min(a, b), max(a, b)))
        arr = arr[sigma]
    assert len(seen) == m * (m - 1) // 2, "tournament schedule incomplete"
    assert np.array_equal(arr, np.arange(m)), "tournament not cyclic"
    return tuple(int(s) for s in sigma)


def default_sweeps(m: int) -> int:
    """Static sweep count giving ~working-precision convergence for the
    bucket sizes used here (m <= 512)."""
    if m <= 8:
        return 5
    if m <= 32:
        return 7
    if m <= 128:
        return 9
    return 11


def fast_sweeps(m: int) -> int:
    """Reduced sweep count for loose-cutoff truncations (>= ~1e-10 relative
    squared, i.e. ~3e-5 amplitude): Jacobi converges quadratically, so 4-7
    sweeps put the off-diagonal residual far below that budget while cutting
    the build cost ~1.6x. Eigenvector unitarity is exact by construction at
    ANY sweep count, so reconstruction-exactness of the complete-Gram SVD
    route is unaffected."""
    if m <= 8:
        return 4
    if m <= 32:
        return 5
    if m <= 128:
        return 6
    return 7


def _round_perm(m: int) -> np.ndarray:
    """One-hot [m, m] matrix P with (X @ P)[:, j] = X[:, sigma(j)] — the
    tournament rotation as a matmul, for the Pallas kernel."""
    sigma = np.asarray(_tournament_sigma(m))
    P = np.zeros((m, m), dtype=np.float32)
    P[sigma, np.arange(m)] = 1.0
    return P


def _adj_perm(m: int) -> np.ndarray:
    """One-hot [m, m] adjacent-swap matrix (partner(2i) = 2i+1)."""
    P = np.zeros((m, m), dtype=np.float32)
    idx = np.arange(m)
    P[idx, idx ^ 1] = 1.0
    return P


@partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(H: jax.Array, *, sweeps: int | None = None):
    """Hermitian eigendecomposition via parallel-order cyclic Jacobi.

    H: [..., m, m] Hermitian (complex or real symmetric). Returns
    ``(lam [..., m] real ascending, V [..., m, m])`` with ``H V = V
    diag(lam)`` and V unitary to machine precision regardless of ``sweeps``.
    """
    m0 = H.shape[-1]
    if H.shape[-2] != m0:
        raise ValueError("jacobi_eigh: matrix must be square")
    if m0 == 1:
        lam = H[..., 0, 0].real
        return lam[..., None], jnp.ones_like(H)

    # Pad odd sizes with a sentinel row/col: its off-diagonals are zero so
    # every rotation touching it is the identity; the huge negative diagonal
    # sorts it first, where it is sliced away.
    odd = m0 % 2
    if odd:
        m = m0 + 1
        pad = [(0, 0)] * (H.ndim - 2) + [(0, 1), (0, 1)]
        H = jnp.pad(H, pad)
        sentinel = -jnp.asarray(jnp.finfo(H.real.dtype).max, H.real.dtype) / 8
        H = H.at[..., m0, m0].set(sentinel)
    else:
        m = m0

    if sweeps is None:
        sweeps = default_sweeps(m)
        if jnp.finfo(H.real.dtype).bits >= 64:
            sweeps += 7  # f64 floors lower; quadratic tail needs more rounds

    c = m // 2
    dtype = H.dtype
    rdtype = H.real.dtype
    sigma = jnp.asarray(_tournament_sigma(m), dtype=jnp.int32)
    eye_c = jnp.eye(c, dtype=dtype)
    V0 = jnp.broadcast_to(jnp.eye(m, dtype=dtype), H.shape)

    def round_step(carry, _):
        Hc, Vc = carry
        diag = jnp.diagonal(Hc, axis1=-2, axis2=-1).real  # [..., m]
        a = diag[..., 0::2]
        b = diag[..., 1::2]
        w = jnp.diagonal(
            Hc[..., 0::2, 1::2], axis1=-2, axis2=-1
        )  # [..., c] = H[2i, 2i+1]
        absw = jnp.abs(w)
        rotate = absw > 0
        safe = jnp.where(rotate, absw, 1.0)
        u = jnp.where(rotate, w / safe.astype(dtype), 1.0)
        tau = (a - b) / (2.0 * safe)
        sgn = jnp.where(tau >= 0, 1.0, -1.0).astype(rdtype)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(rotate, t, 0.0)
        c0 = 1.0 / jnp.sqrt(1.0 + t * t)
        s0 = t * c0
        # J_i = [[c0, -s0 u], [s0 conj(u), c0]] zeroes H[2i, 2i+1]
        c0c = c0.astype(dtype)
        J = jnp.stack(
            [
                jnp.stack([c0c, -(s0.astype(rdtype)).astype(dtype) * u], axis=-1),
                jnp.stack(
                    [s0.astype(dtype) * jnp.conj(u), c0c], axis=-1
                ),
            ],
            axis=-2,
        )  # [..., c, 2, 2]
        # Block-diagonal Q[..., 2i+p, 2j+q] = delta_ij J[..., i, p, q]
        Q = (
            eye_c[:, None, :, None] * J[..., :, :, None, :]
        ).reshape(*J.shape[:-3], m, m)
        Hn = jnp.conj(jnp.swapaxes(Q, -1, -2)) @ Hc @ Q
        Vn = Vc @ Q
        Hn = jnp.take(jnp.take(Hn, sigma, axis=-2), sigma, axis=-1)
        Vn = jnp.take(Vn, sigma, axis=-1)
        return (Hn, Vn), None

    (Hf, Vf), _ = jax.lax.scan(
        round_step, (H, V0), None, length=sweeps * (m - 1)
    )
    lam = jnp.diagonal(Hf, axis1=-2, axis2=-1).real
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    Vf = jnp.take_along_axis(Vf, order[..., None, :], axis=-1)
    if odd:
        lam = lam[..., 1:]
        Vf = Vf[..., :m0, 1:]
    return lam, Vf


@partial(jax.jit, static_argnames=("sweeps",))
def onesided_polish(B: jax.Array, *, sweeps: int = 2):
    """One-sided Jacobi polish: orthogonalize the ROWS of ``B`` [m, b].

    Returns ``(J [m, m] unitary, B_out = J^H B)`` with the rows of ``B_out``
    mutually orthogonal to working precision. Rotation angles are computed
    from FRESH row inner products of the current B each round — linear
    (not squared) conditioning, unlike the carried-Gram eigensolve. Started
    from the complete-Gram SVD's ``B = U^H M`` (rows already near-orthogonal
    except within the sqrt(eps) noise-floor cluster), 1-2 sweeps reach the
    eps floor; this is the TPU-native analog of LAPACK's one-sided-Jacobi
    high-accuracy SVD backing the reference's truncations
    (reference src/linalg/rsvd.jl:97-111).
    """
    m0, b = B.shape[-2], B.shape[-1]
    if m0 == 1:
        return jnp.ones(B.shape[:-2] + (1, 1), B.dtype), B
    odd = m0 % 2
    if odd:
        pad = [(0, 0)] * (B.ndim - 2) + [(0, 1), (0, 0)]
        B = jnp.pad(B, pad)  # zero row: every rotation touching it = identity
    m = m0 + odd

    dtype = B.dtype
    rdtype = B.real.dtype
    cplx = jnp.issubdtype(dtype, jnp.complexfloating)
    c = m // 2
    sigma = jnp.asarray(_tournament_sigma(m), dtype=jnp.int32)
    eye_c = jnp.eye(c, dtype=dtype)
    J0 = jnp.broadcast_to(
        jnp.eye(m, dtype=dtype), B.shape[:-2] + (m, m)
    )

    def round_step(carry, _):
        Bc, Jc = carry
        rn = jnp.sum(jnp.abs(Bc) ** 2, axis=-1)  # [..., m] row sq norms
        a = rn[..., 0::2]
        bb = rn[..., 1::2]
        w = jnp.sum(Bc[..., 0::2, :] * jnp.conj(Bc[..., 1::2, :]), axis=-1)
        absw = jnp.abs(w)
        # Skip pairs already orthogonal relative to their row norms: a
        # rotation computed from pure roundoff noise would mix converged
        # rows for no benefit.
        tol = jnp.asarray(jnp.finfo(rdtype).tiny, rdtype)
        rotate = absw > tol
        safe = jnp.where(rotate, absw, 1.0)
        u = jnp.where(rotate, w / safe.astype(dtype), 1.0)
        tau = (a - bb) / (2.0 * safe)
        sgn = jnp.where(tau >= 0, 1.0, -1.0).astype(rdtype)
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(rotate, t, 0.0)
        c0 = 1.0 / jnp.sqrt(1.0 + t * t)
        s0 = t * c0
        c0c = c0.astype(dtype)
        J2 = jnp.stack(
            [
                jnp.stack([c0c, -(s0.astype(rdtype)).astype(dtype) * u], axis=-1),
                jnp.stack([s0.astype(dtype) * jnp.conj(u), c0c], axis=-1),
            ],
            axis=-2,
        )  # [..., c, 2, 2]: diagonalizes [[a, w], [w*, b]]
        Q = (
            eye_c[:, None, :, None] * J2[..., :, :, None, :]
        ).reshape(*J2.shape[:-3], m, m)
        Bn = jnp.conj(jnp.swapaxes(Q, -1, -2)) @ Bc
        Jn = Jc @ Q
        Bn = jnp.take(Bn, sigma, axis=-2)
        Jn = jnp.take(Jn, sigma, axis=-1)
        return (Bn, Jn), None

    (Bf, Jf), _ = jax.lax.scan(
        round_step, (B, J0), None, length=sweeps * (m - 1)
    )
    if odd:
        Bf = Bf[..., :m0, :]
        Jf = Jf[..., :m0, :m0]
    return Jf, Bf


# --------------------------- Pallas TPU kernel ------------------------------
#
# Same algorithm as jacobi_eigh, but every round runs inside one kernel with
# G and V resident in VMEM — the per-round XLA dispatch overhead (measured
# 20-400us/round on the tunneled backend) collapses to the ~14 MXU dots the
# round actually needs. Complex arithmetic is split real/imag (the backend
# has no complex Pallas support). One grid program per batch element.

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _jacobi_kernel(sweeps: int):
    def kernel(gr_in, gi_in, padj_ref, psig_ref, gr_ref, gi_ref, vr_ref, vi_ref):
        m = gr_in.shape[0]

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def dot_t(a, b):  # a^T @ b
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
        eye = (row == col).astype(jnp.float32)
        # tau == 0 tie-break: partner rows must pick OPPOSITE t signs for Q
        # to stay unitary; break by row parity.
        tiebreak = 1.0 - 2.0 * (row[:, :1] % 2).astype(jnp.float32)  # [m, 1]
        gr_ref[:] = gr_in[:]
        gi_ref[:] = gi_in[:]
        vr_ref[:] = eye
        vi_ref[:] = jnp.zeros((m, m), jnp.float32)
        padj = padj_ref[:]
        psig = psig_ref[:]

        def body(r, _):
            Gr = gr_ref[:]
            Gi = gi_ref[:]
            a = jnp.sum(Gr * eye, axis=1, keepdims=True)  # [m, 1] own diag
            b = dot(padj, a)  # partner diag
            wr = jnp.sum(Gr * padj, axis=1, keepdims=True)
            wi = jnp.sum(Gi * padj, axis=1, keepdims=True)
            # G drifts off exactly-Hermitian through the matmul updates;
            # partner rows must see exactly conjugate couplings or their
            # rotations disagree (non-unitary Q on noise-scale pairs).
            wr = 0.5 * (wr + dot(padj, wr))
            wi = 0.5 * (wi - dot(padj, wi))
            absw = jnp.sqrt(wr * wr + wi * wi)
            rotate = absw > 0.0
            safe = jnp.where(rotate, absw, 1.0)
            ur = jnp.where(rotate, wr / safe, 1.0)
            ui = jnp.where(rotate, wi / safe, 0.0)
            tau = (a - b) / (2.0 * safe)
            sgn = jnp.where(tau > 0.0, 1.0, jnp.where(tau < 0.0, -1.0, tiebreak))
            t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(rotate, t, 0.0)
            # Mosaic's rsqrt is the VPU's ~12-bit hardware approximation;
            # raw, it makes each rotation non-unitary at ~1e-3 and the
            # accumulated V drifts off unitary as a random walk (measured
            # 4e-2 Frobenius defect at m=160 after 7 sweeps). Two Newton
            # steps restore rsqrt to f32 working precision.
            x = 1.0 + t * t
            c0 = jax.lax.rsqrt(x)
            c0 = c0 * (1.5 - 0.5 * x * c0 * c0)
            c0 = c0 * (1.5 - 0.5 * x * c0 * c0)
            s0 = t * c0
            # uniform row formula (odd rows carry -s0, conj(u) of their even
            # partner, which folds into the same expression): Q = c0*I + T.P
            tr = -(s0 * ur)
            ti = -(s0 * ui)
            Qr = c0 * eye + tr * padj
            Qi = ti * padj
            # fold the tournament rotation: Qp = Q @ Psig
            Qpr = dot(Qr, psig)
            Qpi = dot(Qi, psig)
            # A = G @ Qp ; G' = Qp^H A ; V' = V @ Qp
            Ar = dot(Gr, Qpr) - dot(Gi, Qpi)
            Ai = dot(Gr, Qpi) + dot(Gi, Qpr)
            gr_ref[:] = dot_t(Qpr, Ar) + dot_t(Qpi, Ai)
            gi_ref[:] = dot_t(Qpr, Ai) - dot_t(Qpi, Ar)
            Vr = vr_ref[:]
            Vi = vi_ref[:]
            vr_ref[:] = dot(Vr, Qpr) - dot(Vi, Qpi)
            vi_ref[:] = dot(Vr, Qpi) + dot(Vi, Qpr)
            return 0

        jax.lax.fori_loop(0, sweeps * (m - 1), body, 0)

    return kernel


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def jacobi_eigh_pallas(
    H: jax.Array, *, sweeps: int | None = None, interpret: bool = False
):
    """Pallas-fused jacobi_eigh for f32/c64, [B, m, m] or [m, m] (m even).

    Returns (lam ascending real f32, V) like jacobi_eigh. VMEM budget is
    ~8 m^2 floats per program — fine for m <= 512.
    """
    squeeze = H.ndim == 2
    if squeeze:
        H = H[None]
    B, m = H.shape[0], H.shape[-1]
    if m % 2:
        raise ValueError("jacobi_eigh_pallas: m must be even")
    if sweeps is None:
        sweeps = default_sweeps(m)
    Gr = jnp.real(H).astype(jnp.float32)
    Gi = (
        jnp.imag(H).astype(jnp.float32)
        if jnp.issubdtype(H.dtype, jnp.complexfloating)
        else jnp.zeros_like(Gr)
    )
    padj = jnp.asarray(_adj_perm(m))
    psig = jnp.asarray(_round_perm(m))

    mat_spec = pl.BlockSpec((None, m, m), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    perm_spec = pl.BlockSpec((m, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    grout, giout, vr, vi = pl.pallas_call(
        _jacobi_kernel(sweeps),
        grid=(B,),
        in_specs=[mat_spec, mat_spec, perm_spec, perm_spec],
        out_specs=(mat_spec, mat_spec, mat_spec, mat_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, m, m), jnp.float32) for _ in range(4)
        ),
        interpret=interpret,
    )(Gr, Gi, padj, psig)

    lam = jnp.diagonal(grout, axis1=-2, axis2=-1)
    order = jnp.argsort(lam, axis=-1)
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = vr + 1j * vi if jnp.issubdtype(H.dtype, jnp.complexfloating) else vr
    V = V.astype(H.dtype)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    if squeeze:
        return lam[0], V[0]
    return lam, V
