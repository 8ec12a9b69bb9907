"""z-transform (discrete Laplace) MPO builder.

Re-design of reference src/transforms/zt_transformer.jl:41-106:
W_zt = W_qft_paired ∘ W_dt, built as (1) the DT MPO, (2) the paired
2n-site QFT from control_Hphase_ztmps_mpo blocks, (3) one fused composition
(the reference fuses with apply(W_dt, mpo_qft) — DT acts first — then runs a
final compress sweep, :101-104).

Coefficients: chi(k, l) = (1/N) sum_j x_j e^{-(wr*k + 2*pi*i*l) j / N},
addressed on the output by interleaved LSB-first (k, l) bits
(reference docs/src/tutorials/zt.jl:85-93,152-157). Max bond dimension
plateaus near 89-92 (reference docs/src/benchmarking.md:216-219).
"""

from __future__ import annotations

import numpy as np

from qilaplace_tpu.circuits.zt_gates import control_Hphase_ztmps_mpo
from qilaplace_tpu.core.mpo import PairedSiteMPO, mpo_repad
from qilaplace_tpu.ops.apply import apply_mpo_mpo, embed_window
from qilaplace_tpu.transforms.dt import build_dt_mpo
from qilaplace_tpu.utils.config import bucket_for


def build_paired_qft_mpo(
    n: int,
    *,
    cutoff: float = 1e-14,
    maxdim: int = 1000,
    chi: int | None = None,
    dtype=np.complex128,
) -> PairedSiteMPO:
    """The paired 2n-site QFT factor of the z-transform (acts on the copy
    register; reference src/transforms/zt_transformer.jl:78-99)."""
    if chi is None:
        chi = bucket_for(min(maxdim, 16))
    maxdim = min(maxdim, chi)
    acc = mpo_repad(control_Hphase_ztmps_mpo(1, dtype=dtype), chi)
    acc = embed_window(acc, 2 * n, 0)
    for k in range(2, n + 1):
        layer = embed_window(control_Hphase_ztmps_mpo(k, dtype=dtype), 2 * n, 0)
        acc = apply_mpo_mpo(
            acc, layer, chi_out=chi, zip_maxdim=chi, cutoff=cutoff, maxdim=maxdim
        )
    return acc


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
) -> PairedSiteMPO:
    """Build the z-transform MPO at damping ``wr`` (angular axis fixed at
    omega_i = 2*pi by the QFT factor)."""
    if n < 1:
        raise ValueError(f"build_zt_mpo: n must be >= 1, got {n}")
    if chi is None:
        chi = bucket_for(min(maxdim, 128))  # plateau ~89-92
    maxdim_out = min(maxdim, chi)

    W_dt = build_dt_mpo(n, wr, cutoff=cutoff, maxdim=maxdim, chi=chi_dt, dtype=dtype)
    W_qft = build_paired_qft_mpo(
        n, cutoff=cutoff, maxdim=maxdim, chi=chi_qft, dtype=dtype
    )
    if n == 1:
        W = apply_mpo_mpo(W_dt, W_qft)  # exact; tiny chain
        return mpo_repad(W, chi)
    return apply_mpo_mpo(
        W_dt,
        W_qft,
        chi_out=chi,
        zip_maxdim=chi,
        cutoff=cutoff,
        maxdim=maxdim_out,
    )
