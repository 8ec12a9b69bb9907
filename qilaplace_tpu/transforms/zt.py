"""z-transform (discrete Laplace) MPO builder.

Re-design of reference src/transforms/zt_transformer.jl:41-106:
W_zt = W_qft_paired ∘ W_dt. Like the reference, the DT MPO and the paired
2n-site QFT are built separately (each as one scanned layer-folding program
at its own small bond budget) and fused once — apply(W_dt, W_qft), DT acts
first (:101-103) — by a zip-up composition + polish at the full chi.

Coefficients: chi(k, l) = (1/N) sum_j x_j e^{-(wr*k + 2*pi*i*l) j / N},
addressed on the output by interleaved LSB-first (k, l) bits
(reference docs/src/tutorials/zt.jl:85-93,152-157). Max bond dimension
plateaus near 89-92 (reference docs/src/benchmarking.md:216-219).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

from qilaplace_tpu.circuits.dt_gates import (
    control_damping_copy_mpo,
    control_damping_mpo,
)
from qilaplace_tpu.circuits.zt_gates import control_Hphase_ztmps_mpo
from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO, identity_mpo, mpo_repad
from qilaplace_tpu.transforms.dt import build_dt_mpo
from qilaplace_tpu.ops.apply import (
    apply_mpo_mpo,
    compose_layers,
    embed_window,
    pair_layer_stack,
    stack_layers,
)
from qilaplace_tpu.utils.config import bucket_for

_STATIC_BUILD_PAIRED_QFT_MPO = (
    "n", "cutoff", "maxdim", "chi", "dtype", "chi_work"
)
_STATIC_BUILD_ZT_MPO = (
    "n", "cutoff", "maxdim", "chi", "chi_dt", "chi_qft", "dtype", "chi_work"
)


@partial(jax.jit, static_argnames=_STATIC_BUILD_PAIRED_QFT_MPO)
def build_paired_qft_mpo(
    n: int,
    *,
    cutoff: float = 1e-14,
    maxdim: int = 1000,
    chi: int | None = None,
    dtype=np.complex128,
    chi_work: int | None = None,
) -> PairedSiteMPO:
    """The paired 2n-site QFT factor of the z-transform (acts on the copy
    register; reference src/transforms/zt_transformer.jl:78-99)."""
    if chi is None:
        chi = bucket_for(min(maxdim, 16))
    chi = min(chi, bucket_for(4**n))
    maxdim = min(maxdim, chi)
    if n == 1:
        return mpo_repad(control_Hphase_ztmps_mpo(1, dtype=dtype), chi)
    layers = [
        embed_window(control_Hphase_ztmps_mpo(k, dtype=dtype), 2 * n, 0)
        for k in range(1, n + 1)
    ]
    # sequential prefix fold — see the capacity note in transforms/dt.py
    layer_cores, layer_ranks = stack_layers(layers)
    acc = identity_mpo(n, chi=chi, dtype=jnp.dtype(dtype), paired=True)
    out = compose_layers(
        acc.chain, layer_cores, layer_ranks, cutoff=cutoff, maxdim=maxdim,
        chi_work=chi_work, polish="reverse",
        zip_mode="range" if cutoff >= 1e-10 else "svd",
    )
    return PairedSiteMPO(chain=out)


def _build_factors_concurrent(
    n: int,
    wr: float,
    *,
    cutoff: float,
    maxdim: int,
    chi_f: int,
    dtype,
    chi_work_f: int | None,
):
    """Build the DT and paired-QFT zT factors as ONE vmapped layer fold.

    The fold latency is the SEQUENTIAL layer count (each fused composition
    is a chain scan of latency-bound eigensolves). At LOOSE cutoffs
    (>= 1e-10, the flagship f32 path) the DT stack is split at its physical
    seam into Part 1 (control_damping, n layers) and Part 2
    (control_damping_copy, n-1 layers) — both prefix folds in their own
    right — and folded CONCURRENTLY with the n-layer QFT stack as one
    3-way vmapped program of length n, instead of the 2-way fold of length
    2n-1. DT = Part2 ∘ Part1 is restored by one extra fused composition at
    the factor bucket (cheap next to n saved fold iterations). At TIGHT
    cutoffs (the <= 1e-10 parity path) the split is NOT used: the extra
    P2∘P1 composition and the standalone Part-2 product are not plateau-
    bounded prefix products of the DT stack, so their capacity-bound zips
    lose real mass (measured: n=5 forced-device parity 8.3e-8 vs 1e-11 with
    the sequential 2n-1 fold) — there the DT stack folds as one chain,
    concurrent with the padded QFT stack (2-way vmap). Mid-stack pair trees
    are NOT used either way: only prefix products of these gate stacks stay
    at the bond plateau (see the capacity note in transforms/dt.py).
    """
    maxdim_f = min(maxdim, chi_f)
    loose = cutoff >= 1e-10
    zip_mode = "range" if loose else "svd"
    p1_layers = [
        embed_window(control_damping_mpo(n, k, wr, dtype=dtype), 2 * n, 0)
        for k in range(1, n + 1)
    ]
    p2_layers = [
        embed_window(
            control_damping_copy_mpo(n, k, wr, dtype=dtype), 2 * n, 2 * (k - 1)
        )
        for k in range(1, n)
    ]
    qft_layers = [
        embed_window(control_Hphase_ztmps_mpo(k, dtype=dtype), 2 * n, 0)
        for k in range(1, n + 1)
    ]
    if loose:
        stacks = [p1_layers, p2_layers, qft_layers]
    else:
        stacks = [p1_layers + p2_layers, qft_layers]
    chi_l = max(l.chain.chi for st in stacks for l in st)
    L, n2 = max(len(st) for st in stacks), 2 * n

    def pad_stack(layers):
        cores, ranks = stack_layers([mpo_repad(l, chi_l) for l in layers])
        pad = L - cores.shape[0]
        if pad == 0:
            return cores, ranks
        eye = jnp.zeros((pad, n2, chi_l, 2, 2, chi_l), dtype=cores.dtype)
        eye = eye.at[:, :, 0, 0, 0, 0].set(1.0).at[:, :, 0, 1, 1, 0].set(1.0)
        return (
            jnp.concatenate([cores, eye], axis=0),
            jnp.concatenate(
                [ranks, jnp.ones((pad, n2 + 1), jnp.int32)], axis=0
            ),
        )

    padded = [pad_stack(st) for st in stacks]
    lay_c = jnp.stack([c for c, _ in padded])
    lay_r = jnp.stack([r for _, r in padded])
    acc = identity_mpo(n, chi=chi_f, dtype=jnp.dtype(dtype), paired=True).chain
    acc_c = jnp.broadcast_to(acc.cores[None], (len(stacks),) + acc.cores.shape)
    acc_r = jnp.broadcast_to(acc.ranks[None], (len(stacks),) + acc.ranks.shape)

    def fold_one(c, r, lc, lr):
        out = compose_layers(
            MPO(cores=c, ranks=r), lc, lr, cutoff=cutoff, maxdim=maxdim_f,
            chi_work=chi_work_f, polish="reverse", zip_mode=zip_mode,
        )
        return out.cores, out.ranks

    cores2, ranks2 = jax.vmap(fold_one)(acc_c, acc_r, lay_c, lay_r)
    if not loose:
        W_dt = PairedSiteMPO(chain=MPO(cores=cores2[0], ranks=ranks2[0]))
        W_qft = PairedSiteMPO(chain=MPO(cores=cores2[1], ranks=ranks2[1]))
        return W_dt, W_qft
    W_p1 = PairedSiteMPO(chain=MPO(cores=cores2[0], ranks=ranks2[0]))
    W_p2 = PairedSiteMPO(chain=MPO(cores=cores2[1], ranks=ranks2[1]))
    W_qft = PairedSiteMPO(chain=MPO(cores=cores2[2], ranks=ranks2[2]))
    W_dt = apply_mpo_mpo(
        W_p1, W_p2, chi_out=chi_f, cutoff=cutoff, maxdim=maxdim_f,
        chi_work=min(2 * chi_f, chi_f * chi_f), polish="reverse",
        zip_mode=zip_mode,
    )
    return W_dt, W_qft


@partial(jax.jit, static_argnames=_STATIC_BUILD_ZT_MPO)
def build_zt_mpo(
    n: int,
    wr: float,
    *,
    cutoff: float = 1e-14,
    maxdim: int = 1000,
    chi: int | None = None,
    chi_dt: int | None = None,
    chi_qft: int | None = None,
    dtype=np.complex128,
    chi_work: int | None = None,
) -> PairedSiteMPO:
    """Build the z-transform MPO at damping ``wr`` (angular axis fixed at
    omega_i = 2*pi by the QFT factor).

    Staged like the reference (src/transforms/zt_transformer.jl:75-104):
    build the DT factor at its own small bond budget (plateau ~18), the
    paired QFT at its budget, then fuse once with a zip-up composition at
    the full ``chi`` and polish. The small-budget stages keep the O(n^2)
    sweep SVDs tiny; only the single fuse pass works at chi.
    """
    if n < 1:
        raise ValueError(f"build_zt_mpo: n must be >= 1, got {n}")
    if chi is None:
        chi = bucket_for(min(maxdim, 128))  # plateau ~89-92
    chi = min(chi, bucket_for(4**n))
    maxdim_out = min(maxdim, chi)
    if chi_dt is None:
        chi_dt = min(bucket_for(min(maxdim, 32)), bucket_for(4**n))
    if chi_qft is None:
        chi_qft = min(bucket_for(min(maxdim, 32)), bucket_for(4**n))

    if n == 1:
        W_dt = mpo_repad(control_damping_mpo(n, 1, wr, dtype=dtype), 8)
        W_qft = control_Hphase_ztmps_mpo(1, dtype=dtype)
        return mpo_repad(apply_mpo_mpo(W_dt, W_qft), chi)

    # The factor folds always work at capacity 2*chi_f: the zip bond must
    # cover rank_acc * rank_layer (~18 * 3), and the range-mode zip's cost
    # at l = 64 is negligible next to the polish — a narrower fast mode
    # would reintroduce non-canonical cap losses for no real savings.
    # The FUSE capacity only has to cover the true product rank
    # rank_dt * rank_qft ~= 18 * 8 = 144, so chi + 32 (160 at the flagship
    # chi=128) is exact while halving the per-site zip eigensolve cost vs
    # 2*chi (device eigh latency is ~m^3 in the working bucket). Tight
    # cutoffs (parity) keep the full 2*chi capacity.
    if chi_work is not None:
        fuse_work = chi_work
    elif cutoff >= 1e-10:
        fuse_work = min(2 * chi, chi + 32)
    else:
        fuse_work = 2 * chi
    if chi_dt == chi_qft:
        # The DT and paired-QFT factor folds are independent until the fuse;
        # at equal buckets they run CONCURRENTLY as one vmapped fold (the
        # per-iteration eigensolves are latency-bound, so batching the two
        # factors costs ~no extra wall-clock — the verdict's lever (b)).
        W_dt, W_qft = _build_factors_concurrent(
            n, wr, cutoff=cutoff, maxdim=maxdim, chi_f=chi_dt, dtype=dtype,
            chi_work_f=None,
        )
    else:
        W_dt = build_dt_mpo(n, wr, cutoff=cutoff, maxdim=maxdim, chi=chi_dt,
                            dtype=dtype)
        W_qft = build_paired_qft_mpo(n, cutoff=cutoff, maxdim=maxdim,
                                     chi=chi_qft, dtype=dtype)
    # The default fuse works at 2*chi, keeping the zip-up exact (true
    # product rank <= dt_plateau * qft_plateau ~= 18 * 8 = 144 < 256) so the
    # canonical polish lands on the reference's ~89-92 plateau instead of
    # pinning at the chi cap (reference docs/src/benchmarking.md:216-219).
    # chi_work=chi gives the ~4x cheaper zip-at-cap fuse for loose cutoffs.
    # fuse: range-mode zip (cap-bound) + one canonical reverse
    # truncating sweep — the step that sets the final ~89-92 plateau
    return apply_mpo_mpo(
        W_dt,
        W_qft,
        chi_out=chi,
        cutoff=cutoff,
        maxdim=maxdim_out,
        chi_work=fuse_work,
        polish="reverse",
        zip_mode="range" if cutoff >= 1e-10 else "svd",
    )


def zt_mpo(
    n: int,
    wr: float,
    *,
    engine: str = "analytic",
    cutoff: float = 1e-12,
    maxdim: int = 160,
    chi: int | None = None,
    dtype=np.complex64,
    cache: bool = True,
    cache_dir: str | None = None,
    device=None,
    chi_work: int | None = None,
) -> PairedSiteMPO:
    """Production zT MPO entry point: engine dispatch + artifact cache.

    ``engine="analytic"`` (default) evaluates the closed-form kernel by
    rail cross-interpolation + exact Schmidt-product compression
    (transforms/analytic.py) — sub-second host f64 at n=30, every core
    entry f64-accurate. ``engine="gate"`` folds the ~3n gate layers on the
    compute device like the reference (src/transforms/zt_transformer.jl:
    41-106) — kept for bond-plateau parity studies.

    ``cache=True`` persists the finished operator as an .npz artifact
    keyed on (engine, n, wr, cutoff, maxdim, chi, dtype) so repeated
    builds (pole-scan drivers rebuild per wr; benches per process) are a
    ~10 ms load (utils/io.cached_zt_mpo).
    """
    if engine not in ("analytic", "gate"):
        raise ValueError(
            f"zt_mpo: unknown engine {engine!r}; use 'analytic' or 'gate'"
        )
    if cache:
        from qilaplace_tpu.utils.io import cached_zt_mpo

        W, _ = cached_zt_mpo(
            n, wr, cutoff=cutoff, maxdim=maxdim, chi=chi, dtype=dtype,
            chi_work=chi_work, cache_dir=cache_dir, device=device,
            engine=engine,
        )
        return W
    if engine == "analytic":
        from qilaplace_tpu.transforms.analytic import analytic_zt_mpo

        return analytic_zt_mpo(n, wr, cutoff=cutoff, maxdim=maxdim,
                               chi=chi, dtype=dtype)
    return build_zt_mpo(n, wr, cutoff=cutoff, maxdim=maxdim, chi=chi,
                        dtype=dtype, chi_work=chi_work)
