"""Damping-transform gates: controlled damping blocks on the paired register.

Re-design of reference src/circuits/dt_gates.jl. Both block builders return a
PairedSiteMPO on an interleaved window [main_1, copy_1, ..., main_L, copy_L];
embed into the full 2n chain with ops.apply.embed_window. Non-unitary gates:
dampedH (src/circuits/dt_gates.jl:11-17) and R (.:19-25).
"""

from __future__ import annotations

import numpy as np

from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO
from qilaplace_tpu.circuits.qft_gates import I2, proj


def dampedH(wr: float) -> np.ndarray:
    """(1/sqrt2) [[1, 1], [1, e^{-wr/2}]] — non-unitary damped Hadamard."""
    return np.array([[1.0, 1.0], [1.0, np.exp(-wr / 2.0)]]) / np.sqrt(2.0)


def R(wr: float) -> np.ndarray:
    """diag(1, e^{-wr}) — real damping rotation."""
    return np.diag([1.0, np.exp(-wr)])


def control_damping_mpo(n: int, k: int, wr: float, dtype=np.complex128) -> PairedSiteMPO:
    """Damping block with control on main_k, targets R(wr*2^{l-k-1}) on
    main_{l<k}; identities thread the copy register
    (reference control_damping_mpo, src/circuits/dt_gates.jl:30-130).
    Window: pairs 1..k (2k chain sites). The control site acts as
    "project input bit, then dampedH" (verified against the analytic DT
    kernel, reference test/test_dt_transformer.jl:60-238).
    """
    if k < 1:
        raise ValueError(f"control_damping_mpo: k must be >= 1, got {k}")
    if k == 1:
        return PairedSiteMPO(
            chain=MPO.from_core_list(
                [
                    dampedH(wr).astype(dtype).reshape(1, 2, 2, 1),
                    I2.astype(dtype).reshape(1, 2, 2, 1),
                ]
            )
        )
    cores = []
    for l in range(1, k):
        wfac = wr * 2.0 ** (l - k - 1)
        lb = 1 if l == 1 else 2
        Wm = np.zeros((lb, 2, 2, 2), dtype=dtype)
        if l == 1:
            Wm[0, :, :, 0] = I2
            Wm[0, :, :, 1] = R(wfac)
        else:
            Wm[0, :, :, 0] = I2
            Wm[1, :, :, 1] = R(wfac)
        cores.append(Wm)
        Wc = np.zeros((2, 2, 2, 2), dtype=dtype)
        Wc[0, :, :, 0] = I2
        Wc[1, :, :, 1] = I2
        cores.append(Wc)
    Wm = np.zeros((2, 2, 2, 2), dtype=dtype)
    for c in range(2):
        Wm[c, :, :, c] = dampedH(wr) @ proj(c)
    cores.append(Wm)
    Wc = np.zeros((2, 2, 2, 1), dtype=dtype)
    Wc[0, :, :, 0] = I2
    Wc[1, :, :, 0] = I2
    cores.append(Wc)
    return PairedSiteMPO(chain=MPO.from_core_list(cores))


def control_damping_copy_mpo(
    n: int, k: int, wr: float, dtype=np.complex128
) -> PairedSiteMPO:
    """Damping block with control on copy_k (projector reads the copy bit),
    targets R(wr*2^{j-2}) on main_{k+j-1}, j = 2..L
    (reference control_damping_copy_mpo, src/circuits/dt_gates.jl:133-229).
    Window: pairs k..n (L = n-k+1 pairs, 2L chain sites); embed at chain
    offset 2(k-1).
    """
    if k < 1:
        raise ValueError(f"control_damping_copy_mpo: k must be >= 1, got {k}")
    L = n - k + 1
    if L < 1:
        raise ValueError("control_damping_copy_mpo: window is empty (k > n)")
    if L == 1:
        return PairedSiteMPO(
            chain=MPO.from_core_list(
                [
                    I2.astype(dtype).reshape(1, 2, 2, 1),
                    I2.astype(dtype).reshape(1, 2, 2, 1),
                ]
            )
        )
    cores = []
    Wm = np.zeros((1, 2, 2, 1), dtype=dtype)
    Wm[0, :, :, 0] = I2
    cores.append(Wm)
    Wc = np.zeros((1, 2, 2, 2), dtype=dtype)
    for c in range(2):
        Wc[0, :, :, c] = proj(c)
    cores.append(Wc)
    for j in range(2, L):
        wfac = wr * 2.0 ** (j - 2)
        Wm = np.zeros((2, 2, 2, 2), dtype=dtype)
        Wm[0, :, :, 0] = I2
        Wm[1, :, :, 1] = R(wfac)
        cores.append(Wm)
        Wc = np.zeros((2, 2, 2, 2), dtype=dtype)
        Wc[0, :, :, 0] = I2
        Wc[1, :, :, 1] = I2
        cores.append(Wc)
    wfac = wr * 2.0 ** (L - 2)
    Wm = np.zeros((2, 2, 2, 2), dtype=dtype)
    Wm[0, :, :, 0] = I2
    Wm[1, :, :, 1] = R(wfac)
    cores.append(Wm)
    Wc = np.zeros((2, 2, 2, 1), dtype=dtype)
    Wc[0, :, :, 0] = I2
    Wc[1, :, :, 0] = I2
    cores.append(Wc)
    return PairedSiteMPO(chain=MPO.from_core_list(cores))
