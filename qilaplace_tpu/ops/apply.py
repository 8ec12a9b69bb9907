"""MPO application and composition.

* ``apply(W, psi)`` — exact contraction with fused bonds, no truncation
  (semantics of reference src/linalg/apply.jl:75-122: output bond dimension
  is the product; compression is the caller's job). The fused output bond's
  valid entries are scattered (not a leading block), which every downstream
  op tolerates; ``ranks`` stays a count upper bound and becomes a leading
  block again after the first sweep.
* ``apply(W, psi, maxdim=..., cutoff=...)`` — the TPU performance path: a
  fused contract-then-truncate "zip-up" sweep so the product bond
  chiW*chiS is never materialized across the whole chain, followed by
  optional two-site polish sweeps. This replaces the reference's
  apply-then-compress! sequence for large n.
* ``apply_mpo_mpo(W1, W2)`` — operator composition, W1 acts first
  (reference src/linalg/apply.jl:124-199; build_zt_mpo relies on this order,
  src/transforms/zt_transformer.jl:101-103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO, _mpo_chain
from qilaplace_tpu.core.mps import (
    MPS,
    ZTMPS,
    _chain,
    _rewrap,
    _sweep_right,
    _two_site_sweep,
)
from qilaplace_tpu.ops.truncation import range_split, sketch_matrix, svd_split
from qilaplace_tpu.utils.config import highest_precision


def _apply_exact(W: MPO, psi: MPS) -> MPS:
    """Per-site contract + bond fuse; output chi = chiW * chiS."""
    Wc, Ac = W.cores, psi.cores
    n = psi.n
    if W.n != n:
        raise ValueError(
            f"apply: MPO and MPS must have the same number of sites "
            f"(got {W.n} and {n})"
        )
    out = jnp.einsum("naoic,nbid->nabocd", Wc, Ac)
    chi_out = W.chi * psi.chi
    out = out.reshape(n, chi_out, 2, chi_out)
    ranks = W.ranks * psi.ranks
    return MPS(cores=out, ranks=ranks, amplitude=psi.amplitude)


def _apply_fused(
    W: MPO,
    psi: MPS,
    *,
    maxdim: int,
    cutoff: float,
    chi_out: int | None = None,
    final_sweeps: int = 1,
    chi_work: int | None = None,
    zip_mode: str = "svd",
) -> MPS:
    """Zip-up apply: contract site, truncate, carry the remainder.

    The carry ``C[x, a, b]`` connects the already-truncated left part (bond x,
    size chi_work) to the not-yet-contracted W bond (a) and psi bond (b). The
    full product bond only ever exists locally.

    ``chi_work`` (default ``chi_out``) is the static bucket of the zip and
    polish stages; the zip-up truncates against a non-orthonormal right
    environment, so a zip capped at ``chi_out`` loses weight non-canonically
    (~1e-8 relative at chi 128 on the flagship pipeline) that the polish
    cannot recover. Working at ``2 * chi_out`` restores exact-apply accuracy
    (measured 7e-12 at n=8) for ~2x the zip FLOPs; the default keeps the
    fast path for magnitude scans. The final forward polish sweep leaves
    ranks <= maxdim <= chi_out in the leading block, so the closing slice
    is exact.
    """
    n, chiW, chiS = psi.n, W.chi, psi.chi
    if W.n != n:
        raise ValueError("apply: MPO and MPS must have the same number of sites")
    if chi_out is None:
        chi_out = min(maxdim, chiW * chiS)
    if chi_work is None:
        chi_work = chi_out
    chi_work = min(max(chi_work, chi_out), chiW * chiS)
    maxdim = min(maxdim, chi_out)
    dtype = jnp.result_type(W.dtype, psi.dtype)

    # the zip inherits the polish cutoff's factorization profile
    fast = isinstance(cutoff, (int, float)) and 0.0 < cutoff and cutoff >= 1e-10
    C0 = jnp.zeros((chi_work, chiW, chiS), dtype=dtype).at[0, 0, 0].set(1.0)
    if zip_mode == "range":
        # cap-bound zip: one shared Gaussian sketch, one eigensolve per site
        # (see ops.truncation.range_split). The per-site cutoff rule is not
        # applied (rank rides the cap) — the polish sweeps, if any, apply it
        # canonically.
        om = sketch_matrix(jax.random.PRNGKey(1234), chiW * chiS, chi_work,
                           dtype)

    def step(carry, inp):
        C, _ = carry
        Wcore, Acore = inp
        T = jnp.einsum("xab,aoic,bid->xocd", C, Wcore, Acore)
        M = T.reshape(chi_work * 2, chiW * chiS)
        if zip_mode == "range":
            L, R, rank = range_split(M, om)
            rank = jnp.minimum(rank, jnp.int32(maxdim))
        else:
            L, R, rank = svd_split(
                M, cutoff=cutoff, maxdim=chi_work, absorb="right",
                out_dim=chi_work, fast=fast or None,
            )
        core = L.reshape(chi_work, 2, chi_work)
        return (R.reshape(chi_work, chiW, chiS), rank), (core, rank)

    (Cf, _), (cores, bond_ranks) = jax.lax.scan(
        step,
        (C0, jnp.int32(0)),
        (W.cores[: n - 1].astype(dtype), psi.cores[: n - 1].astype(dtype)),
    )
    # Last site: contract the remainder; right boundary is (0, 0) -> index 0.
    last = jnp.einsum(
        "xab,aoic,bid->xocd",
        Cf,
        W.cores[n - 1].astype(dtype),
        psi.cores[n - 1].astype(dtype),
    )[:, :, 0, 0]
    last = jnp.pad(last[:, :, None], ((0, 0), (0, 0), (0, chi_work - 1)))
    cores = jnp.concatenate([cores, last[None]], axis=0)
    ranks = (
        jnp.ones((n + 1,), dtype=jnp.int32)
        .at[1:n]
        .set(bond_ranks)
    )

    # a wider zip must be swept down before the closing slice
    sweeps = final_sweeps if chi_work == chi_out else max(final_sweeps, 1)
    cores2, ranks2 = cores, ranks
    for _ in range(sweeps):
        cores2, ranks2 = _two_site_sweep(
            cores2, ranks2, cutoff=cutoff, maxdim=maxdim, reverse=True
        )
        cores2, ranks2 = _two_site_sweep(
            cores2, ranks2, cutoff=cutoff, maxdim=maxdim, reverse=False
        )
    if chi_work > chi_out:
        cores2 = cores2[:, :chi_out, :, :chi_out]
    return MPS(cores=cores2, ranks=ranks2, amplitude=psi.amplitude)


@highest_precision
def apply(
    W,
    psi,
    *,
    maxdim: int | None = None,
    cutoff: float | None = None,
    chi_out: int | None = None,
    final_sweeps: int = 1,
    chi_work: int | None = None,
    zip_mode: str = "svd",
):
    """Apply an MPO to an MPS (or ZTMPS with a PairedSiteMPO).

    Without ``maxdim``/``cutoff``: exact, untruncated (reference semantics).
    With them: fused contract-then-truncate sweep (TPU performance path);
    ``chi_work`` > ``chi_out`` trades ~2x zip FLOPs for exact-apply-level
    accuracy (see :func:`_apply_fused`). ``zip_mode='range'`` replaces the
    per-site truncated SVD with the cap-only randomized range split
    (ops.truncation.range_split) — the fast path for magnitude scans where
    the output bond rides the cap anyway.
    """
    Wm = _mpo_chain(W)
    pm = _chain(psi)
    if isinstance(psi, ZTMPS) != isinstance(W, PairedSiteMPO):
        raise TypeError(
            "apply: pair SingleSiteMPO with SignalMPS and PairedSiteMPO with ZTMPS"
        )
    if maxdim is None and cutoff is None and chi_out is None:
        res = _apply_exact(Wm, pm)
    else:
        res = _apply_fused(
            Wm,
            pm,
            maxdim=maxdim if maxdim is not None else (chi_out or Wm.chi * pm.chi),
            cutoff=0.0 if cutoff is None else cutoff,
            chi_out=chi_out,
            final_sweeps=final_sweeps,
            chi_work=chi_work,
            zip_mode=zip_mode,
        )
    return _rewrap(psi, res)


def _compose_fused(
    A: MPO,
    B: MPO,
    *,
    chi_out: int,
    zip_maxdim: int,
    cutoff: float,
    maxdim: int,
    final_sweeps: int = 1,
    chi_work: int | None = None,
    polish: str = "full",
    zip_mode: str = "svd",
) -> MPO:
    """Zip-up composition B ∘ A with mask-truncation.

    Stage 1 (zip-up, cutoff=0): contract site-by-site, keeping at most
    ``zip_maxdim`` singular values — exact whenever the true intermediate rank
    fits, and leaves the chain left-canonical.
    Stage 2: two-site polish sweeps (right-to-left then left-to-right) with
    the real ``cutoff``/``maxdim`` — canonical-gauge truncation, the moral
    equivalent of the reference's zip-up/zip-down and two-pass
    zip_to_compress (src/transforms/qft_transformer.jl:13-101,
    src/transforms/dt_transformer.jl:167-288).

    ``chi_work`` is the static bucket the zip and polish run at (default
    ``2 * chi_out``, capped by the product bond). The zip-up's right
    environment is NOT orthonormal, so any rank it discards is thrown away
    non-canonically; working wider than the final bucket keeps the zip exact
    whenever the true product rank fits in ``chi_work`` — the polish then
    reaches the reference's canonical minimal ranks instead of carrying zip
    noise above the cutoff (this is what pinned the zT build at the chi cap
    instead of the ~90 plateau of reference docs/src/benchmarking.md:216-219).
    The final forward polish sweep caps ranks at ``maxdim <= chi_out`` and
    leaves valid data in the leading block, so the closing slice is exact.

    ``polish='reverse'`` runs only the right-to-left truncating sweep per
    ``final_sweeps`` iteration: the zip leaves the chain left-canonical, so
    that single sweep already truncates in canonical gauge (the forward
    sweep of the 'full' cycle mostly re-orthogonalizes for the NEXT reverse
    pass, which a following fold iteration's zip redoes anyway). This halves
    the polish cost inside layer folds; reverse sweeps also leave valid data
    in the leading block, so the closing slice stays exact.
    """
    n, chiA, chiB = A.n, A.chi, B.chi
    dtype = jnp.result_type(A.dtype, B.dtype)
    if chi_work is None:
        chi_work = min(2 * chi_out, chiA * chiB)
    chi_work = max(chi_work, chi_out)
    zip_maxdim = min(zip_maxdim, chi_work)
    maxdim = min(maxdim, chi_out)

    # zip runs at cutoff 0 (cap-only) but inherits the factorization
    # profile of the real cutoff applied by the polish
    fast = isinstance(cutoff, (int, float)) and 0.0 < cutoff and cutoff >= 1e-10
    C0 = jnp.zeros((chi_work, chiB, chiA), dtype=dtype).at[0, 0, 0].set(1.0)
    if zip_mode == "range":
        om = sketch_matrix(jax.random.PRNGKey(1234), chiB * chiA, chi_work,
                           dtype)

    def step(carry, inp):
        C, _ = carry
        Bcore, Acore = inp
        T = jnp.einsum("xba,botc,atid->xoicd", C, Bcore, Acore)
        M = T.reshape(chi_work * 4, chiB * chiA)
        if zip_mode == "range":
            L, R, rank = range_split(M, om)
            rank = jnp.minimum(rank, jnp.int32(zip_maxdim))
        else:
            L, R, rank = svd_split(
                M, cutoff=0.0, maxdim=zip_maxdim, absorb="right",
                out_dim=chi_work, fast=fast or None,
            )
        return (R.reshape(chi_work, chiB, chiA), rank), (
            L.reshape(chi_work, 4, chi_work),
            rank,
        )

    (Cf, _), (cores4, bond_ranks) = jax.lax.scan(
        step,
        (C0, jnp.int32(0)),
        (B.cores[: n - 1].astype(dtype), A.cores[: n - 1].astype(dtype)),
    )
    last = jnp.einsum(
        "xba,botc,atid->xoicd",
        Cf,
        B.cores[n - 1].astype(dtype),
        A.cores[n - 1].astype(dtype),
    )[:, :, :, 0, 0].reshape(chi_work, 4)
    last = jnp.pad(last[:, :, None], ((0, 0), (0, 0), (0, chi_work - 1)))
    cores4 = jnp.concatenate([cores4, last[None]], axis=0)
    ranks = jnp.ones((n + 1,), dtype=jnp.int32).at[1:n].set(bond_ranks)

    for _ in range(final_sweeps):
        cores4, ranks = _two_site_sweep(
            cores4, ranks, cutoff=cutoff, maxdim=maxdim, reverse=True
        )
        if polish == "full":
            cores4, ranks = _two_site_sweep(
                cores4, ranks, cutoff=cutoff, maxdim=maxdim, reverse=False
            )
    if chi_work > chi_out:
        # exact: the final truncating sweep left ranks <= maxdim <= chi_out
        # with valid data in the leading block
        cores4 = cores4[:, :chi_out, :, :chi_out]
    return MPO(cores=cores4.reshape(n, chi_out, 2, 2, chi_out), ranks=ranks)


@highest_precision
def compose_layers(
    acc: MPO,
    layer_cores: jax.Array,
    layer_ranks: jax.Array,
    *,
    cutoff: float,
    maxdim: int,
    final_sweeps: int = 1,
    chi_work: int | None = None,
    polish: str = "full",
    zip_mode: str = "svd",
) -> MPO:
    """Fold a stack of layer MPOs into ``acc``: result = layer_L ∘ ... ∘
    layer_1 ∘ acc, via one ``lax.scan`` whose body is the fused zip-up
    composition + polish.

    This is the TPU-shaped form of the reference's transform-build loops
    (src/transforms/qft_transformer.jl:141-157,
    dt_transformer.jl:351-405): every iteration has identical padded shapes,
    so the whole build compiles to a single program whose size does not grow
    with n.

    layer_cores: [L, n, cl, 2, 2, cl]; layer_ranks: [L, n+1].
    """
    chi = acc.chi
    chi_layer = layer_cores.shape[2]
    if chi_work is None:
        chi_work = min(2 * chi, chi * chi_layer)

    def body(carry, layer):
        cores, ranks = carry
        lc, lr = layer
        out = _compose_fused(
            MPO(cores=cores, ranks=ranks),
            MPO(cores=lc, ranks=lr),
            chi_out=chi,
            zip_maxdim=chi_work,
            cutoff=cutoff,
            maxdim=maxdim,
            final_sweeps=final_sweeps,
            chi_work=chi_work,
            polish=polish,
            zip_mode=zip_mode,
        )
        return (out.cores, out.ranks), None

    (cores, ranks), _ = jax.lax.scan(
        body, (acc.cores, acc.ranks), (layer_cores, layer_ranks)
    )
    return MPO(cores=cores, ranks=ranks)


def stack_layers(layers) -> tuple[jax.Array, jax.Array]:
    """Stack a list of equal-shape MPO chains into (cores [L, ...],
    ranks [L, n+1]) for :func:`compose_layers`."""
    chains = [_mpo_chain(l) for l in layers]
    cores = jnp.stack([c.cores for c in chains], axis=0)
    ranks = jnp.stack([c.ranks for c in chains], axis=0)
    return cores, ranks


def pair_layer_stack(layers) -> tuple[jax.Array, jax.Array]:
    """Exactly compose adjacent layer pairs and stack the results:
    pair i = layer_{2i+1} ∘ layer_{2i}, so folding the pair stack in order
    equals folding the original list — with HALF the sequential fold
    iterations. The pairing itself is one batched einsum (no truncation;
    pair bond = chi_l^2, small for the chi_l <= 8 gate layers), so the
    entire halving is a single MXU program. An odd tail layer is paired
    with the identity.

    Returns ``(cores [ceil(L/2), n, chi_l^2, 2, 2, chi_l^2],
    ranks [ceil(L/2), n+1])`` for :func:`compose_layers`.
    """
    chains = [_mpo_chain(l) for l in layers]
    if len(chains) % 2:
        n, chi_l = chains[0].n, chains[0].chi
        eye = jnp.zeros((n, chi_l, 2, 2, chi_l), dtype=chains[0].dtype)
        eye = eye.at[:, 0, 0, 0, 0].set(1.0).at[:, 0, 1, 1, 0].set(1.0)
        chains.append(MPO(cores=eye, ranks=jnp.ones((n + 1,), jnp.int32)))
    Ac = jnp.stack([c.cores for c in chains[0::2]], axis=0)  # acts first
    Bc = jnp.stack([c.cores for c in chains[1::2]], axis=0)
    P, n, chi_l = Ac.shape[0], Ac.shape[1], Ac.shape[2]
    out = jnp.einsum("pnbotc,pnatid->pnbaoicd", Bc, Ac)
    out = out.reshape(P, n, chi_l * chi_l, 2, 2, chi_l * chi_l)
    ranksA = jnp.stack([c.ranks for c in chains[0::2]], axis=0)
    ranksB = jnp.stack([c.ranks for c in chains[1::2]], axis=0)
    return out, ranksA * ranksB


@highest_precision
def apply_mpo_mpo(
    W1,
    W2,
    *,
    maxdim: int | None = None,
    cutoff: float | None = None,
    chi_out: int | None = None,
    zip_maxdim: int | None = None,
    final_sweeps: int = 1,
    chi_work: int | None = None,
    offset: int | None = None,
    polish: str = "full",
    zip_mode: str = "svd",
):
    """Compose two MPOs: result = W2 after W1 (W1 acts first).

    Dense equivalence: mpo_to_dense(result) == mpo_to_dense(W2) @
    mpo_to_dense(W1).

    Partial-window composition (reference src/linalg/apply.jl:124-199: the
    shorter MPO acts on a contiguous site window of the longer one, identity
    outside): pass ``offset`` = the 0-based site position of the shorter
    MPO's first site within the longer chain (in register sites for paired
    MPOs — the reference locates the window by matching Index objects, which
    positional axes replace). The shorter MPO is embedded with identities
    and the chains composed as equal-length ones.

    Without truncation kwargs the composition is exact with product bonds;
    with them it runs the fused zip-up + polish path.
    """
    paired = isinstance(W1, PairedSiteMPO)
    if paired != isinstance(W2, PairedSiteMPO):
        raise TypeError("apply_mpo_mpo: both operands must have the same register type")
    A, B = _mpo_chain(W1), _mpo_chain(W2)
    if A.n != B.n:
        if offset is None:
            raise ValueError(
                "apply_mpo_mpo: lengths differ — pass offset=<site position "
                "of the shorter MPO's window within the longer chain> "
                f"(got {A.n} and {B.n} chain sites)"
            )
        step = 2 if paired else 1
        n_long = max(A.n, B.n)  # chain sites
        if A.n < B.n:
            A = _mpo_chain(embed_window(W1, n_long, step * offset))
        else:
            B = _mpo_chain(embed_window(W2, n_long, step * offset))
    elif offset not in (None, 0):
        raise ValueError(
            "apply_mpo_mpo: offset is only meaningful for unequal lengths"
        )
    if maxdim is None and cutoff is None and chi_out is None:
        out = jnp.einsum("nbotc,natid->nbaoicd", B.cores, A.cores)
        n = A.n
        chi_prod = A.chi * B.chi
        out = out.reshape(n, chi_prod, 2, 2, chi_prod)
        res = MPO(cores=out, ranks=A.ranks * B.ranks)
    else:
        if chi_out is None:
            chi_out = min(maxdim or A.chi * B.chi, A.chi * B.chi)
        if chi_work is None:
            chi_work = min(2 * chi_out, A.chi * B.chi)
        res = _compose_fused(
            A,
            B,
            chi_out=chi_out,
            zip_maxdim=zip_maxdim if zip_maxdim is not None else chi_work,
            cutoff=0.0 if cutoff is None else cutoff,
            maxdim=maxdim if maxdim is not None else chi_out,
            final_sweeps=final_sweeps,
            chi_work=chi_work,
            polish=polish,
            zip_mode=zip_mode,
        )
    return PairedSiteMPO(chain=res) if paired else res


@highest_precision
def mpo_compress(W, *, cutoff: float = 1e-14, maxdim: int | None = None, sweeps: int = 1):
    """Two-pass canonical compression of an MPO chain: gauge sweep then
    truncating two-site sweeps (reference zip_to_compress_mpo,
    src/transforms/dt_transformer.jl:167-288)."""
    m = _mpo_chain(W)
    n, chi = m.n, m.chi
    if maxdim is None:
        maxdim = chi
    cores4 = m.cores.reshape(n, chi, 4, chi)
    cores4, ranks = _sweep_right(
        cores4, m.ranks, cutoff=0.0, maxdim=chi, start=0, stop=n - 1
    )
    for _ in range(sweeps):
        cores4, ranks = _two_site_sweep(
            cores4, ranks, cutoff=cutoff, maxdim=maxdim, reverse=True
        )
        cores4, ranks = _two_site_sweep(
            cores4, ranks, cutoff=cutoff, maxdim=maxdim, reverse=False
        )
    res = MPO(cores=cores4.reshape(n, chi, 2, 2, chi), ranks=ranks)
    return PairedSiteMPO(chain=res) if isinstance(W, PairedSiteMPO) else res


@highest_precision
def embed_window(W, n_total: int, start: int):
    """Embed a window MPO into an ``n_total``-site chain, identities outside
    (reference test/preamble_test.jl:128-181 embed_mpo)."""
    m = _mpo_chain(W)
    nw, chi = m.n, m.chi
    if start < 0 or start + nw > n_total:
        raise ValueError("embed_window: window out of range")
    eye = jnp.zeros((chi, 2, 2, chi), dtype=m.dtype)
    eye = eye.at[0, 0, 0, 0].set(1.0).at[0, 1, 1, 0].set(1.0)
    pre = jnp.broadcast_to(eye, (start, chi, 2, 2, chi))
    post = jnp.broadcast_to(eye, (n_total - start - nw, chi, 2, 2, chi))
    cores = jnp.concatenate([pre, m.cores, post], axis=0)
    ranks = jnp.concatenate(
        [
            jnp.ones((start,), jnp.int32),
            m.ranks,
            jnp.ones((n_total - start - nw,), jnp.int32),
        ]
    )
    out = MPO(cores=cores, ranks=ranks)
    return PairedSiteMPO(chain=out) if isinstance(W, PairedSiteMPO) else out


@highest_precision
def apply_coefficient_batch(W, psi, configs) -> jax.Array:
    """Batched ``<config| W |psi>`` WITHOUT forming the truncated product.

    The pole-scan readout of ``coefficient_batch(apply(W, psi), cfg)``
    inherits the apply's truncation arithmetic, whose roundoff lives at the
    STATE-NORM scale (~eps * ||W psi||) — while the scanned coefficients
    near a pole sit orders of magnitude below the norm, so in f32 the
    relative-to-peak error floors at ~1e-2 (measured at n=14; the rel-peak
    floor is eps * ||out|| / peak). A direct zipper contraction of the
    elementary bra, the operator, and the state keeps the roundoff RELATIVE
    to the running path product instead (measured: rounding f64-built W/psi
    cores to f32 does not degrade the scanned coefficients at all), which is
    the TPU-native route to reference-grade scan accuracy in f32 —
    reference tutorials read coefficients off the f64 product state
    (docs/src/tutorials/zt.jl:307-316), where the same floor sits at
    eps_f64 * norm/peak and is invisible.

    ``configs`` is [B, n] output bits (site 1 = MSB, same convention as
    :func:`~qilaplace_tpu.core.mps.coefficient_batch`). Cost per site is
    exactly TWO dense GEMMs — [B*chi_p, chi_w] x [chi_w, 4*chi_w] over the
    whole W core, then a per-config output-bit gather, then
    [B*chi_w, 2*chi_p] x [2*chi_p, chi_p] — MXU-shaped at any batch, with
    the config-dependent branch select done on the (cheap) intermediate
    instead of doubling the second contraction. Repad W/psi to tight bond
    buckets first when the caps are much larger than the actual ranks.
    """
    wm = _mpo_chain(W)
    pm = _chain(psi)
    configs = jnp.asarray(configs)
    B = configs.shape[0]
    cw, cp = wm.chi, pm.chi
    dtype = jnp.result_type(wm.dtype, pm.dtype)
    v0 = jnp.zeros((B, cw, cp), dtype=dtype).at[:, 0, 0].set(1.0)

    def step(v, inp):
        Wc, pc, bits = inp  # [cw,2,2,cw], [cp,2,cp], [B]
        # GEMM 1: contract the W bond for BOTH output bits at once —
        # (B*cp, cw) x (cw, 2*2*cw); one large matmul instead of four.
        t = jnp.einsum("Bab,aK->BbK", v, Wc.reshape(cw, 4 * cw))
        t = t.reshape(B, cp, 2, 2, cw)
        # select this site's output bit per config (o is free, not summed)
        t = jnp.take_along_axis(
            t, bits[:, None, None, None, None], axis=2
        )[:, :, 0]  # [B, cp, 2, cw]
        # GEMM 2: contract (psi bond, s) jointly — (B*cw, 2*cp) x (2*cp, cp)
        v = jnp.einsum("BbsA,bsc->BAc", t, pc)
        return v, None

    v, _ = jax.lax.scan(step, v0, (wm.cores, pm.cores, configs.T))
    return pm.amplitude * v[:, 0, 0]


@highest_precision
def zipper_chain(W, psi) -> MPS:
    """Per-site Kronecker combination of an operator and a state into ONE
    effective chain of branch-selected transfer matrices:

        K[site, (a,b), o, (c,d)] = sum_s W[a, o, s, c] * psi[b, s, d]

    Contracting K along a configuration of output bits reproduces
    ``<config| W |psi>`` exactly (same path products as
    :func:`apply_coefficient_batch`, with the physical sum s contracted
    against the state up front). The payoff is the SHAPE: the per-site
    readout becomes two chi_eff x chi_eff branch matmuls with
    chi_eff = chi_W * chi_psi — a K-dim of 128+ that fills the MXU and
    maps directly onto the VMEM-resident Pallas readout kernel
    (ops.pallas_kernels.coefficient_batch_pallas), where the factored
    two-GEMM zipper has K = chi_psi (tiny) on its second contraction.
    Worth it when chi_psi is small (the flops grow as chi_psi^2 vs the
    factored form's chi_psi): with the rank-4 cross-encoded states
    chi_eff = 256 and the whole chain is VMEM-chunkable."""
    wm = _mpo_chain(W)
    pm = _chain(psi)
    if wm.n != pm.n:
        raise ValueError("zipper_chain: site-count mismatch")
    K = jnp.einsum("naosc,nbsd->nabocd", wm.cores, pm.cores)
    chi = wm.chi * pm.chi
    K = K.reshape(pm.n, chi, 2, chi)
    return MPS(cores=K, ranks=wm.ranks * pm.ranks, amplitude=pm.amplitude)


# Operator sugar: W * psi and W1 * W2 (reference src/linalg/apply.jl:233-236).
# The reference defines *(W1, W2) = apply(W1, W2), where W1's output feeds
# W2's input — i.e. the product W1 * W2 means W2 ∘ W1. We keep that.
def _mpo_mul(self, other):
    if isinstance(other, (MPS, ZTMPS)):
        return apply(self, other)
    if isinstance(other, (MPO, PairedSiteMPO)):
        return apply_mpo_mpo(self, other)
    return NotImplemented


MPO.__mul__ = _mpo_mul
PairedSiteMPO.__mul__ = _mpo_mul
