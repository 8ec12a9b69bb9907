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
from qilaplace_tpu.core.mpo import PairedSiteMPO, identity_mpo, mpo_repad
from qilaplace_tpu.transforms.dt import build_dt_mpo
from qilaplace_tpu.ops.apply import (
    apply_mpo_mpo,
    compose_layers,
    embed_window,
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
    layer_cores, layer_ranks = stack_layers(layers)
    # sequential prefix fold — see the note in transforms/dt.py
    acc = identity_mpo(n, chi=chi, dtype=jnp.dtype(dtype), paired=True)
    out = compose_layers(
        acc.chain, layer_cores, layer_ranks, cutoff=cutoff, maxdim=maxdim,
        chi_work=chi_work,
    )
    return PairedSiteMPO(chain=out)


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

    # fast mode (chi_work < 2*chi) propagates to the factor builds: their
    # folds zip at their own cap instead of 2x
    fuse_work = chi_work if chi_work is not None else 2 * chi
    fast = fuse_work < 2 * chi
    W_dt = build_dt_mpo(n, wr, cutoff=cutoff, maxdim=maxdim, chi=chi_dt,
                        dtype=dtype, chi_work=chi_dt if fast else None)
    W_qft = build_paired_qft_mpo(n, cutoff=cutoff, maxdim=maxdim, chi=chi_qft,
                                 dtype=dtype,
                                 chi_work=chi_qft if fast else None)
    # The default fuse works at 2*chi, keeping the zip-up exact (true
    # product rank <= dt_plateau * qft_plateau ~= 18 * 8 = 144 < 256) so the
    # canonical polish lands on the reference's ~89-92 plateau instead of
    # pinning at the chi cap (reference docs/src/benchmarking.md:216-219).
    # chi_work=chi gives the ~4x cheaper zip-at-cap fuse for loose cutoffs.
    return apply_mpo_mpo(
        W_dt,
        W_qft,
        chi_out=chi,
        cutoff=cutoff,
        maxdim=maxdim_out,
        chi_work=fuse_work,
    )
