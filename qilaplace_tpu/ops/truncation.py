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

Routing (``truncated_svd``): LAPACK on CPU; on device, a complete-Gram
factorization through the Jacobi eigensolver when the small side is small,
and a randomized range-finder sketch (GEMM + CholeskyQR2 + power iteration,
then the complete-Gram step on the [l, b] projection) when the small side is
much larger than ``maxdim`` — the MXU-shaped path that keeps every
compression sweep on the TPU. Under sketching the cutoff rule still counts
the mass OUTSIDE the captured subspace: the total squared weight is taken
from ||M||_F^2, not from the sketch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qilaplace_tpu.ops.complexlinalg import (
    _device_eigh,
    _native_complex_linalg,
    csvd,
    gram_orthonormalize,
)
from qilaplace_tpu.ops.jacobi import fast_sweeps
from qilaplace_tpu.utils.config import highest_precision

# Loose truncation budgets tolerate loose factorizations: at relative
# squared cutoffs >= this, the device path runs fewer Jacobi sweeps and no
# power iteration (factorization residuals land far below the truncation
# scale sqrt(cutoff) ~ 3e-5). Static at trace time — the cutoff is a Python
# float in every builder/sweep call.
FAST_CUTOFF = 1e-10


def truncation_rank(s: jax.Array, cutoff, maxdim, mindim=1, *, total=None,
                    noise_floor=None) -> jax.Array:
    """Number of singular values kept under the relative-squared-cutoff rule.

    ``s`` must be non-negative and sorted descending. ``total`` overrides the
    total squared weight (pass ||M||_F^2 when ``s`` only spans a captured
    subspace, so uncaptured mass counts as discarded). ``noise_floor``
    (relative to s_max) additionally discards singular values that are
    indistinguishable from the working precision's GEMM roundoff — in f32
    a [a, b] product carries ~eps*sqrt(b) noise per projected row, so at
    tight cutoffs the rule would otherwise keep pure-noise directions and
    bloat every bond to its cap (measured: flagship encode bond 128 instead
    of ~4 at cutoff 1e-11). Returns a traced int32 in
    [mindim, min(maxdim, len(s))].
    """
    p = s * s
    k = s.shape[0]
    # Exact suffix sums: tail[i] = sum_{j > i} p_j (discarded weight when
    # keeping i+1 values). Computing total - cumsum instead leaves O(eps)
    # rounding residue that defeats tiny cutoffs under XLA fusion.
    suffix = jnp.cumsum(p[::-1])[::-1]
    captured = suffix[0]
    if total is None:
        total = captured
    else:
        total = jnp.maximum(total, captured)
    missing = total - captured
    tail = jnp.concatenate([suffix[1:], jnp.zeros((1,), dtype=p.dtype)])
    ok = (tail + missing) <= cutoff * total
    rank = jnp.where(jnp.any(ok), jnp.argmax(ok) + 1, k)
    if noise_floor is not None:
        smax = jnp.maximum(s[0], jnp.finfo(s.dtype).tiny)
        above = jnp.sum(s > noise_floor * smax).astype(rank.dtype)
        rank = jnp.minimum(rank, jnp.maximum(above, 1))
    rank = jnp.clip(rank, mindim, jnp.minimum(maxdim, k))
    return rank.astype(jnp.int32)


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


# Second-pass (graded-Gram refinement) sweep count — see _gram_svd.
POLISH_SWEEPS = 4


def _gram_svd(M: jax.Array, sweeps: int | None = None,
              polish: int = POLISH_SWEEPS, os_sweeps: int = 0):
    """Complete-Gram SVD on the device path, with refinement passes for
    LINEAR (not squared) truncation accuracy.

    Pass 1: U = complete eigenbasis of the small-side Gram (M M^H). This
    factorization M = U (U^H M) is exact for ANY unitary U, but U's columns
    for singular values below sqrt(eps)*s_max are noise — the Gram's entries
    are uniformly O(s_max^2), so small values drown (squared conditioning).

    Pass 2 (``polish`` > 0): the rows of B = U^H M are already near the
    singular directions, so their fresh Gram B B^H is GRADED — entry (p, q)
    is computed to eps * s_p * s_q absolute accuracy, and one more eigh pass
    drops the singular-value noise floor from sqrt(eps)*s_max toward
    eps*s_max (Demmel-Veselic).

    Pass 3 (``os_sweeps`` > 0): one-sided Jacobi on the ROWS of B
    (ops.jacobi.onesided_polish). Rotation angles come from fresh row inner
    products of the CURRENT factor and the singular values are read off as
    actual row norms, so their relative accuracy is eps-grade independent of
    how converged the pass-1 eigenbasis was — the TPU-native equivalent of
    LAPACK's one-sided-Jacobi high-accuracy SVD behind the reference's
    truncations (reference src/linalg/rsvd.jl:97-111). This is what makes
    cutoffs below ~1e-9 (relative squared) meaningful in f32.
    """
    from qilaplace_tpu.ops.jacobi import onesided_polish

    a, b = M.shape
    eps = jnp.finfo(M.real.dtype).eps
    if a <= b:
        _, U = _device_eigh(M @ jnp.conj(M.T), sweeps=sweeps)
        B = jnp.conj(U.T) @ M
        if polish:
            _, V2 = _device_eigh(B @ jnp.conj(B.T), sweeps=polish)
            U = U @ V2
            B = jnp.conj(V2.T) @ B
        if os_sweeps:
            J, B = onesided_polish(B, sweeps=os_sweeps)
            U = U @ J
        s = jnp.linalg.norm(B, axis=1)
        order = jnp.argsort(-s)
        U, B, s = U[:, order], B[order], s[order]
        smax = jnp.maximum(s[0], jnp.finfo(s.dtype).tiny)
        keep = s > 4.0 * eps * smax
        inv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
        return U, s, B * inv[:, None].astype(M.dtype)
    _, V = _device_eigh(jnp.conj(M.T) @ M, sweeps=sweeps)
    B = M @ V
    if polish:
        _, W2 = _device_eigh(jnp.conj(B.T) @ B, sweeps=polish)
        V = V @ W2
        B = B @ W2
    if os_sweeps:
        J, Bt = onesided_polish(jnp.conj(B.T), sweeps=os_sweeps)
        V = V @ J
        B = jnp.conj(Bt.T)
    s = jnp.linalg.norm(B, axis=0)
    order = jnp.argsort(-s)
    V, B, s = V[:, order], B[:, order], s[order]
    smax = jnp.maximum(s[0], jnp.finfo(s.dtype).tiny)
    keep = s > 4.0 * eps * smax
    inv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
    return B * inv[None, :].astype(M.dtype), s, jnp.conj(V.T)


def _sketched_svd(M: jax.Array, l: int, power_iters: int,
                  sweeps: int | None = None, polish: int = POLISH_SWEEPS):
    """Randomized top-l factorization: returns (U [a, l], s [l], Vh [l, b]).

    Range finder + Gram orthonormalization + power iteration, then the
    complete-Gram step on the small projection (reference
    src/linalg/rsvd.jl:62-118, re-shaped for the MXU). Orthonormalization is
    the eigh-based Gram whitening (padding-safe, exact zero columns beyond
    the numerical rank) — the zip-up matrices this sees are chronically
    rank-deficient, where shifted CholeskyQR breaks down."""
    a, b = M.shape
    transpose = a > b
    if transpose:
        M = jnp.conj(M.T)
        a, b = b, a
    # deterministic sketch (the reference reseeds 1234 per call, rsvd.jl:74)
    key = jax.random.PRNGKey(1234)
    rdtype = M.real.dtype
    if jnp.issubdtype(M.dtype, jnp.complexfloating):
        kr, ki = jax.random.split(key)
        Om = (
            jax.random.normal(kr, (b, l), dtype=rdtype)
            + 1j * jax.random.normal(ki, (b, l), dtype=rdtype)
        ).astype(M.dtype)
    else:
        Om = jax.random.normal(key, (b, l), dtype=M.dtype)
    # 8*eps relative-lambda mask floor (range_split's rationale): the default
    # eps*l floor would discard every direction below sqrt(eps*l)*s_max,
    # capping the capture far above the truncation scales the fast profiles
    # run at. Three Newton-Schulz passes absorb the larger whitening defect.
    eps8 = 8.0 * float(jnp.finfo(M.real.dtype).eps) / l
    Q, _ = gram_orthonormalize(M @ Om, eps=eps8, sweeps=sweeps, ns_steps=3)
    for _ in range(power_iters):
        Q, _ = gram_orthonormalize(jnp.conj(M.T) @ Q, eps=eps8, sweeps=sweeps,
                                   ns_steps=3)
        Q, _ = gram_orthonormalize(M @ Q, eps=eps8, sweeps=sweeps, ns_steps=3)
    B = jnp.conj(Q.T) @ M  # [l, b]
    Ub, s, Vh = _gram_svd(B, sweeps=sweeps, polish=polish)
    U = Q @ Ub
    if transpose:
        return jnp.conj(Vh.T), s, jnp.conj(U.T)
    return U, s, Vh


@highest_precision
def truncated_svd(M: jax.Array, *, cutoff=0.0, maxdim=None, mindim=1,
                  power_iters: int = 1, fast: bool | None = None):
    """SVD with mask-based truncation.

    Returns ``(U, s, Vh, rank)`` with U ``[a, k]``, s ``[k]``, Vh ``[k, b]``
    for some static k <= min(a, b) (k < min(a, b) on the sketched device
    route); columns/rows at index >= rank are zeroed so downstream
    contractions of the padded factors stay exact.
    """
    a, b = M.shape
    k = min(a, b)
    if maxdim is None:
        maxdim = k
    maxdim = min(maxdim, k)

    # Factorization profiles (see FAST_CUTOFF; callers whose own cutoff
    # lives elsewhere — e.g. the cutoff-0 zip stage of a fused composition,
    # which is capacity-bound and needs only an orthonormal basis — pass
    # ``fast`` explicitly):
    # * fast (loose cutoffs): fast pass-1 sweeps, 4-sweep graded polish, no
    #   power iteration.
    # * tight/f32: fast pass-1 sweeps + a 6-sweep graded polish — measured
    #   truncation-reconstruction within 2-3x of the ideal tail down to
    #   cutoff 1e-11 on [320, 1024] graded spectra
    #   (scripts/probe_gramsvd_tpu.py), at a fraction of the default-sweeps
    #   cost.
    # * tight/f64 (the forced-device parity path): deep default sweeps +
    #   power iteration — wall-clock does not matter there, 1e-8-grade
    #   parity does.
    if fast is None:
        fast = (
            isinstance(cutoff, (int, float))
            and cutoff >= FAST_CUTOFF
            and cutoff > 0.0
        )
    f32 = M.real.dtype == jnp.float32
    sweeps = None
    if fast:
        power_iters = 0
        polish = POLISH_SWEEPS
    elif f32:
        power_iters = 0
        polish = 6
    else:
        polish = POLISH_SWEEPS

    # Working-precision noise floor for the rank decision: projections /
    # Gram formations of an [a, b] matrix carry ~eps*sqrt(dim) GEMM roundoff
    # per row, so singular values below it are indistinguishable from noise
    # (harmless 1e-14-scale on the f64 LAPACK path; load-bearing at tight
    # cutoffs in f32 — see truncation_rank).
    nf = 2.0 * float(jnp.finfo(M.real.dtype).eps) * float(max(a, b)) ** 0.5

    if _native_complex_linalg():
        U, s, Vh = csvd(M)
        rank = truncation_rank(s, cutoff, maxdim, mindim, noise_floor=nf)
    else:
        l = min(k, _round8(maxdim + min(32, max(8, maxdim // 4))))
        # The sketch's range capture floors at ~sqrt(8*eps)*s_max (the Gram
        # orthonormalization mask; see _sketched_svd) — fine for the fast/f32
        # profiles, but the tight-f64 parity path needs truncations accurate
        # to ~1e-10*s_max (measured: routing the n=5 forced-device build
        # through the sketch floors the pipeline at 8.5e-8 regardless of
        # cutoff), so it always takes the complete-Gram route.
        if k <= max(64, (5 * l) // 4) or not (fast or f32):
            U, s, Vh = _gram_svd(
                M,
                sweeps=fast_sweeps(k) if (fast or f32) else None,
                polish=polish,
            )
            rank = truncation_rank(s, cutoff, maxdim, mindim, noise_floor=nf)
        else:
            if fast or f32:
                sweeps = fast_sweeps(l)
            U, s, Vh = _sketched_svd(M, l, power_iters, sweeps=sweeps,
                                     polish=polish)
            total = jnp.sum(jnp.abs(M) ** 2).astype(s.dtype)
            rank = truncation_rank(s, cutoff, maxdim, mindim, total=total,
                                   noise_floor=nf)
    kk = s.shape[0]
    keep = jnp.arange(kk) < rank
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
    fast: bool | None = None,
):
    """Split ``M`` into ``L @ R`` through a truncated SVD.

    ``absorb`` places the singular values on 'left' (L = U s, R = Vh),
    'right' (L = U, R = s Vh) or 'both' (sqrt split). The inner (bond) axis is
    padded or sliced to ``out_dim`` (default min(a, b)); exact because masked
    entries are zero and rank <= maxdim <= out_dim is enforced.

    Returns ``(L, R, rank)``.
    """
    a, b = M.shape
    if out_dim is None:
        out_dim = min(a, b)
    if maxdim is None:
        maxdim = out_dim
    maxdim = min(maxdim, out_dim)
    U, s, Vh, rank = truncated_svd(
        M, cutoff=cutoff, maxdim=maxdim, mindim=mindim, fast=fast
    )
    if absorb == "left":
        L, R = U * s[None, :], Vh
    elif absorb == "right":
        L, R = U, s[:, None] * Vh
    elif absorb == "both":
        sq = jnp.sqrt(s)
        L, R = U * sq[None, :], sq[:, None] * Vh
    else:
        raise ValueError("absorb must be 'left', 'right' or 'both'")
    kk = s.shape[0]
    if out_dim <= kk:
        L, R = L[:, :out_dim], R[:out_dim, :]
    else:
        L = jnp.pad(L, ((0, 0), (0, out_dim - kk)))
        R = jnp.pad(R, ((0, out_dim - kk), (0, 0)))
    return L, R, rank


def range_split(
    M: jax.Array,
    om: jax.Array,
    *,
    sweeps: int | None = None,
):
    """Cap-only randomized split ``M ~= Q @ R`` with ``R = Q^H M`` and Q an
    orthonormal basis of the sketched range ``M @ om`` (om: [b, l] Gaussian).

    For zip stages whose bond is CAP-bound (cutoff 0, rank pinned at the
    static bucket) the kept subspace is range(M om) either way — measured on
    a 1..1e-8 f32 spectrum [256, 4096] at cap 128, the full sketched SVD's
    reconstruction error (8.5e-3) equals the plain range-finder's (8.3e-3),
    both dominated by sketch capture, not factorization. This split skips
    the two Gram eigensolves of the SVD refinement: ONE eigensolve + the
    Newton-Schulz passes — ~3x cheaper per zip site on the device.

    Returns ``(Q [a, l], R [l, b], rank)``; columns/rows past ``rank`` are
    exact zeros.
    """
    l = om.shape[1]
    if sweeps is None:
        sweeps = max(3, fast_sweeps(l) - 1)
    Y = M @ om.astype(M.dtype)
    # Mask floor at 8*eps in RELATIVE lambda (not eps*l): the zip must keep
    # directions down to the truncation amplitude ~sqrt(cutoff), and the
    # default eps*l floor (s ~ sqrt(eps*l)*smax) would discard them. This
    # limits range mode to cutoffs >= ~64*eps relative-squared — the
    # FAST_CUTOFF regime it is routed to.
    eps8 = 8.0 * float(jnp.finfo(M.real.dtype).eps) / l
    Q, rank = gram_orthonormalize(Y, eps=eps8, sweeps=sweeps, ns_steps=3)
    return Q, jnp.conj(Q.T) @ M, rank


def sketch_matrix(key, b: int, l: int, dtype) -> jax.Array:
    """Gaussian sketch [b, l] for :func:`range_split` (complex when dtype
    is; the reference reseeds 1234 per call — rsvd.jl:74 — so a shared
    deterministic sketch across zip sites matches its spirit)."""
    if jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        kr, ki = jax.random.split(key)
        rdt = jnp.finfo(dtype).dtype
        return (
            jax.random.normal(kr, (b, l), dtype=rdt)
            + 1j * jax.random.normal(ki, (b, l), dtype=rdt)
        ).astype(dtype)
    return jax.random.normal(key, (b, l), dtype=dtype)


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
