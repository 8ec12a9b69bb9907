"""Masked truncated SVD — the static-shape replacement for ITensors' dynamic
bond truncation.

Every matrix here carries a zero-padding invariant: entries outside the
"valid" leading block are exactly zero. Truncation decisions therefore become
mask updates (zero out discarded singular triplets and record the new rank as
a traced integer) instead of shape changes, so sweeps stay jit-stable
(SURVEY.md section 7, "Hard parts").

Cutoff semantics mirror ITensors' relative squared-singular-value rule used
throughout the reference (e.g. src/signals/SignalConverters.jl:84,
src/mps.jl:929): discard the smallest singular values whose total squared
weight does not exceed ``cutoff`` times the total squared weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qilaplace_tpu.ops.complexlinalg import csvd, _native_complex_linalg
from qilaplace_tpu.utils.config import highest_precision


def truncation_rank(s: jax.Array, cutoff, maxdim, mindim=1, *, embedded: bool | None = None) -> jax.Array:
    """Number of singular values kept under the relative-squared-cutoff rule.

    ``s`` must be non-negative and sorted descending (jnp.linalg.svd output).
    Returns a traced int32 in [mindim, min(maxdim, len(s))].

    On the real-embedding backend path (no native complex SVD), basis
    rotation leaves a flat tail of junk singular values around 1e-4 * s_max
    whose squared sum can exceed tiny cutoffs and pin ranks at the cap; a
    gap-aware noise haircut removes that tail. It only engages when the
    bottom-quarter median sits well below s_max (flat spectra — e.g.
    unitary operators — stay untouched), and only on the embedding path
    (``embedded``: pass False when ``s`` came from a native SVD — e.g. real
    dtypes on any backend — so the cutoff semantics stay exact; None keeps
    the backend-based default for callers that cannot know the source).
    """
    p = s * s
    k = s.shape[0]
    # Exact suffix sums: tail[i] = sum_{j > i} p_j (discarded weight when
    # keeping i+1 values). Computing total - cumsum instead leaves O(eps)
    # rounding residue that defeats tiny cutoffs under XLA fusion.
    suffix = jnp.cumsum(p[::-1])[::-1]
    total = suffix[0]
    tail = jnp.concatenate([suffix[1:], jnp.zeros((1,), dtype=p.dtype)])
    ok = tail <= cutoff * total
    rank = jnp.where(jnp.any(ok), jnp.argmax(ok) + 1, k)
    if embedded is None:
        embedded = not _native_complex_linalg()
    if embedded and k >= 8:
        smax = jnp.maximum(s[0], jnp.finfo(s.dtype).tiny)
        noise = jnp.median(s[(3 * k) // 4 :])
        floor = jnp.where(noise < 1e-3 * smax, 8.0 * noise, 0.0)
        rank_floor = jnp.sum(s > floor)
        rank = jnp.minimum(rank, jnp.maximum(rank_floor, 1))
    rank = jnp.clip(rank, mindim, jnp.minimum(maxdim, k))
    return rank.astype(jnp.int32)


@highest_precision
def truncated_svd(M: jax.Array, *, cutoff=0.0, maxdim=None, mindim=1):
    """SVD with mask-based truncation.

    Returns ``(U, s, Vh, rank)`` with U ``[a, k]``, s ``[k]``, Vh ``[k, b]``
    (k = min(a, b)); columns/rows at index >= rank are zeroed so downstream
    contractions of the padded factors stay exact.
    """
    a, b = M.shape
    k = min(a, b)
    if maxdim is None:
        maxdim = k
    U, s, Vh = csvd(M)
    embedded = (
        jnp.issubdtype(M.dtype, jnp.complexfloating)
        and not _native_complex_linalg()
    )
    rank = truncation_rank(s, cutoff, maxdim, mindim, embedded=embedded)
    keep = jnp.arange(k) < rank
    s = jnp.where(keep, s, 0.0)
    U = jnp.where(keep[None, :], U, 0.0)
    Vh = jnp.where(keep[:, None], Vh, 0.0)
    return U, s, Vh, rank


def svd_split(
    M: jax.Array,
    *,
    cutoff=0.0,
    maxdim=None,
    mindim=1,
    absorb: str = "right",
    out_dim: int | None = None,
):
    """Split ``M`` into ``L @ R`` through a truncated SVD.

    ``absorb`` places the singular values on 'left' (L = U s, R = Vh),
    'right' (L = U, R = s Vh) or 'both' (sqrt split). The inner (bond) axis is
    padded or sliced to ``out_dim`` (default min(a, b)); exact because masked
    entries are zero and rank <= maxdim <= out_dim is enforced.

    Returns ``(L, R, rank)``.
    """
    a, b = M.shape
    k = min(a, b)
    if out_dim is None:
        out_dim = k
    if maxdim is None:
        maxdim = out_dim
    maxdim = min(maxdim, out_dim)
    U, s, Vh, rank = truncated_svd(M, cutoff=cutoff, maxdim=maxdim, mindim=mindim)
    if absorb == "left":
        L, R = U * s[None, :], Vh
    elif absorb == "right":
        L, R = U, s[:, None] * Vh
    elif absorb == "both":
        sq = jnp.sqrt(s)
        L, R = U * sq[None, :], sq[:, None] * Vh
    else:
        raise ValueError("absorb must be 'left', 'right' or 'both'")
    if out_dim <= k:
        L, R = L[:, :out_dim], R[:out_dim, :]
    else:
        L = jnp.pad(L, ((0, 0), (0, out_dim - k)))
        R = jnp.pad(R, ((0, out_dim - k), (0, 0)))
    return L, R, rank


def orthogonal_split(M: jax.Array, *, side: str = "left", out_dim: int | None = None):
    """Gauge-fixing split with no truncation beyond exact zeros.

    side='left':  M = Q @ C with Q having orthonormal valid columns.
    side='right': M = C @ Q with Q having orthonormal valid rows.

    Implemented via SVD rather than QR: LAPACK/XLA QR of a rank-deficient
    padded matrix leaves garbage in the orthogonal completion columns, which
    would break the zero-padding invariant; SVD lets us mask exactly.
    Returns ``(Q, C, rank)`` shaped like svd_split.
    """
    if side == "left":
        Q, C, rank = svd_split(M, cutoff=0.0, absorb="right", out_dim=out_dim)
        return Q, C, rank
    if side == "right":
        L, Q, rank = svd_split(M, cutoff=0.0, absorb="left", out_dim=out_dim)
        return Q, L, rank
    raise ValueError("side must be 'left' or 'right'")
