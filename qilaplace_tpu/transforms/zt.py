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

    Both factor builds are prefix folds of embedded gate layers at the same
    bucket; stacking them on a leading factor axis and vmapping
    :func:`compose_layers` halves the sequential fold latency (the shorter
    QFT stack is padded with identity layers, folded last — a no-op up to
    cutoff-level truncation noise).
    """
    maxdim_f = min(maxdim, chi_f)
    dt_layers = [
        embed_window(control_damping_mpo(n, k, wr, dtype=dtype), 2 * n, 0)
        for k in range(1, n + 1)
    ] + [
        embed_window(
            control_damping_copy_mpo(n, k, wr, dtype=dtype), 2 * n, 2 * (k - 1)
        )
        for k in range(1, n)
    ]
    qft_layers = [
        embed_window(control_Hphase_ztmps_mpo(k, dtype=dtype), 2 * n, 0)
        for k in range(1, n + 1)
    ]
    chi_l = max(
        max(l.chain.chi for l in dt_layers),
        max(l.chain.chi for l in qft_layers),
    )
    dt_layers = [mpo_repad(l, chi_l) for l in dt_layers]
    qft_layers = [mpo_repad(l, chi_l) for l in qft_layers]
    dt_c, dt_r = stack_layers(dt_layers)
    q_c, q_r = stack_layers(qft_layers)
    L, n2, chi_p = max(dt_c.shape[0], q_c.shape[0]), 2 * n, dt_c.shape[2]

    def pad_stack(cores, ranks):
        pad = L - cores.shape[0]
        if pad == 0:
            return cores, ranks
        eye = jnp.zeros((pad, n2, chi_p, 2, 2, chi_p), dtype=cores.dtype)
        eye = eye.at[:, :, 0, 0, 0, 0].set(1.0).at[:, :, 0, 1, 1, 0].set(1.0)
        return (
            jnp.concatenate([cores, eye], axis=0),
            jnp.concatenate(
                [ranks, jnp.ones((pad, n2 + 1), jnp.int32)], axis=0
            ),
        )

    lay_c = jnp.stack([pad_stack(dt_c, dt_r)[0], pad_stack(q_c, q_r)[0]])
    lay_r = jnp.stack([pad_stack(dt_c, dt_r)[1], pad_stack(q_c, q_r)[1]])
    acc = identity_mpo(n, chi=chi_f, dtype=jnp.dtype(dtype), paired=True).chain
    acc_c = jnp.broadcast_to(acc.cores[None], (2,) + acc.cores.shape)
    acc_r = jnp.broadcast_to(acc.ranks[None], (2,) + acc.ranks.shape)

    def fold_one(c, r, lc, lr):
        out = compose_layers(
            MPO(cores=c, ranks=r), lc, lr, cutoff=cutoff, maxdim=maxdim_f,
            chi_work=chi_work_f, polish="reverse",
            zip_mode="range" if cutoff >= 1e-10 else "svd",
        )
        return out.cores, out.ranks

    cores2, ranks2 = jax.vmap(fold_one)(acc_c, acc_r, lay_c, lay_r)
    W_dt = PairedSiteMPO(chain=MPO(cores=cores2[0], ranks=ranks2[0]))
    W_qft = PairedSiteMPO(chain=MPO(cores=cores2[1], ranks=ranks2[1]))
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
    fuse_work = chi_work if chi_work is not None else 2 * chi
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
