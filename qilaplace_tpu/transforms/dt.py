"""Damping-transform MPO builder.

Re-design of reference src/transforms/dt_transformer.jl:312-407. Two parts:
Part 1 — control_damping blocks (control on main_k) for k = 1..n; Part 2 —
control_damping_copy blocks (control on copy_k) for k = 1..n-1. The
reference's grow-the-chain + zip_to_combine (QR) + two-pass zip_to_compress
machinery (:20-288) becomes: embed each block into the full padded 2n chain
and run the fused zip-up composition + canonical polish sweeps.

Semantics: DT |j>|j> = (1/sqrt N) sum_k e^{-wr k j / N} |k_rev>|j>
(reference test/test_dt_transformer.jl:60-91; output main register is
bit-reversed / LSB-first). Max bond dimension plateaus near 17-18
(reference docs/src/benchmarking.md:214-216).
"""

from __future__ import annotations

import numpy as np

from qilaplace_tpu.circuits.dt_gates import (
    control_damping_copy_mpo,
    control_damping_mpo,
)
from qilaplace_tpu.core.mpo import PairedSiteMPO, mpo_repad
from qilaplace_tpu.ops.apply import apply_mpo_mpo, embed_window
from qilaplace_tpu.utils.config import bucket_for


def build_dt_mpo(
    n: int,
    wr: float,
    *,
    cutoff: float = 1e-14,
    maxdim: int = 1000,
    chi: int | None = None,
    dtype=np.complex128,
) -> PairedSiteMPO:
    """Build the paired-register damping-transform MPO for damping ``wr``."""
    if n < 1:
        raise ValueError(f"build_dt_mpo: n must be >= 1, got {n}")
    if chi is None:
        chi = bucket_for(min(maxdim, 32))  # plateau ~17-18
    maxdim = min(maxdim, chi)

    acc = mpo_repad(control_damping_mpo(n, 1, wr, dtype=dtype), chi)
    if n == 1:
        return acc
    acc = embed_window(acc, 2 * n, 0)
    for k in range(2, n + 1):
        layer = embed_window(control_damping_mpo(n, k, wr, dtype=dtype), 2 * n, 0)
        acc = apply_mpo_mpo(
            acc, layer, chi_out=chi, zip_maxdim=chi, cutoff=cutoff, maxdim=maxdim
        )
    for k in range(1, n):
        layer = embed_window(
            control_damping_copy_mpo(n, k, wr, dtype=dtype), 2 * n, 2 * (k - 1)
        )
        acc = apply_mpo_mpo(
            acc, layer, chi_out=chi, zip_maxdim=chi, cutoff=cutoff, maxdim=maxdim
        )
    return acc
