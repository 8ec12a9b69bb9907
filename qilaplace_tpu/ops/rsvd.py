"""Randomized truncated SVD — the encoder workhorse.

TPU re-design of reference src/linalg/rsvd.jl:38-121: the range finder is a
single big GEMM (MXU-resident) followed by a padding-safe Gram
orthonormalization, ``q`` optional power iterations, and a small dense SVD.

Differences from the reference, by design:
* matrices are positional (the combiner/uncombine steps vanish);
* orthonormalization is Gram-based (one GEMM + a small eigh) instead of
  LAPACK QR: QR of a rank-deficient padded matrix writes garbage into the
  orthogonal-completion columns, breaking the zero-padding invariant, while
  the Gram route lets us mask exactly;
* randomness comes from a jax PRNG key (the reference reseeds a global RNG
  with seed 1234 on every call, src/linalg/rsvd.jl:74).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qilaplace_tpu.ops.complexlinalg import (  # noqa: F401 (re-export)
    _native_complex_linalg,
    csvd,
    gram_orthonormalize,
)
from qilaplace_tpu.ops.jacobi import fast_sweeps
from qilaplace_tpu.ops.truncation import truncation_rank
from qilaplace_tpu.utils.config import highest_precision


@highest_precision
def rsvd(
    M: jax.Array,
    key: jax.Array,
    *,
    k: int = 20,
    p: int = 10,
    q: int = 0,
    cutoff: float = 1e-15,
    maxdim: int | None = None,
    mindim: int = 1,
    out_dim: int | None = None,
):
    """Randomized SVD of a (possibly zero-padded) matrix ``M`` [a, b].

    Returns ``(U, s, Vh, rank)`` with U [a, out_dim], s [out_dim],
    Vh [out_dim, b]; entries at index >= rank are zero.
    ``k``: target rank, ``p``: oversampling, ``q``: power iterations
    (parameter semantics of reference src/linalg/rsvd.jl:38-50;
    maxdim defaults to k there and here).
    """
    a, b = M.shape
    # Sketch width rounded up to a multiple of 8: the device eigensolves on
    # the [l, l] Gram matrices only take the VMEM-resident Pallas kernel for
    # EVEN l (ops.complexlinalg._device_eigh) — an odd k+p (e.g. the
    # reference-default 50+5) would silently fall back to the lax.scan
    # Jacobi at ~2 ms/round, turning the encode latency-bound.
    l = min(((k + p + 7) // 8) * 8, a, b)
    if maxdim is None:
        maxdim = k
    if out_dim is None:
        out_dim = min(maxdim, l)
    maxdim = min(maxdim, out_dim, l)

    # Loose truncation budgets tolerate the reduced Jacobi sweep profile
    # (quadratic convergence puts the residual far below sqrt(cutoff)).
    sweeps = (
        fast_sweeps(l)
        if isinstance(cutoff, (int, float)) and cutoff >= 1e-10 and cutoff > 0
        else None
    )

    cdtype = M.dtype
    if jnp.issubdtype(cdtype, jnp.complexfloating):
        kr, ki = jax.random.split(key)
        Om = (
            jax.random.normal(kr, (b, l), dtype=jnp.finfo(cdtype).dtype)
            + 1j * jax.random.normal(ki, (b, l), dtype=jnp.finfo(cdtype).dtype)
        ).astype(cdtype) / jnp.sqrt(2.0).astype(cdtype)
    else:
        Om = jax.random.normal(key, (b, l), dtype=cdtype)

    Y = M @ Om  # [a, l] — the big GEMM
    Q, _ = gram_orthonormalize(Y, sweeps=sweeps)
    for _ in range(q):
        Z = M.conj().T @ Q  # [b, l]
        Qz, _ = gram_orthonormalize(Z, sweeps=sweeps)
        Y = M @ Qz
        Q, _ = gram_orthonormalize(Y, sweeps=sweeps)

    B = Q.conj().T @ M  # [l, b] small
    if _native_complex_linalg():
        Ub, s, Vh = csvd(B)  # native LAPACK
    else:
        from qilaplace_tpu.ops.truncation import _gram_svd

        Ub, s, Vh = _gram_svd(B, sweeps=sweeps)  # l x min(l,b)
    # rank decision floored at the working-precision GEMM noise of the
    # [l, b] projection (see ops.truncation.truncation_rank)
    nf = 2.0 * float(jnp.finfo(M.real.dtype).eps) * float(max(a, b)) ** 0.5
    rank = truncation_rank(s, cutoff, maxdim, mindim, noise_floor=nf)
    kk = s.shape[0]
    keep = jnp.arange(kk) < rank
    s = jnp.where(keep, s, 0.0)
    Ub = jnp.where(keep[None, :], Ub, 0.0)
    Vh = jnp.where(keep[:, None], Vh, 0.0)
    U = Q @ Ub  # [a, kk]

    def fit(X, axis):
        if X.shape[axis] == out_dim:
            return X
        if X.shape[axis] > out_dim:
            sl = [slice(None)] * X.ndim
            sl[axis] = slice(0, out_dim)
            return X[tuple(sl)]
        pad = [(0, 0)] * X.ndim
        pad[axis] = (0, out_dim - X.shape[axis])
        return jnp.pad(X, pad)

    return fit(U, 1), fit(s, 0), fit(Vh, 0), rank
