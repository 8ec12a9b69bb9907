"""QFT elementary gates and the controlled-Hadamard-phase layer MPO.

Re-design of reference src/circuits/qft_gates.jl. Gate matrices act as
``out = M @ in`` (our MPO core convention W[l, s_out, s_in, r]); the
reference stores ITensors with primed = input, so its tensors are the
transposes of these acting matrices — all elementary gates here are symmetric
so only the control-site operator ordering matters, and the acting order was
verified against the bit-reversed DFT oracle (qn_matrix,
reference test/test_qft_transformer.jl:23-33).
"""

from __future__ import annotations

import numpy as np

from qilaplace_tpu.core.mpo import MPO

I2 = np.eye(2)
H = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2.0)


def P(theta: float) -> np.ndarray:
    """Phase gate diag(1, e^{-i theta}) — the -i convention of the reference
    (src/circuits/qft_gates.jl:24-30)."""
    return np.diag([1.0, np.exp(-1j * theta)])


def proj(c: int) -> np.ndarray:
    """Projector |c><c| (reference Π, src/circuits/qft_gates.jl:32-38)."""
    M = np.zeros((2, 2))
    M[c, c] = 1.0
    return M


def control_Hphase_mpo(k: int, dtype=np.complex128) -> MPO:
    """One QFT layer on a window of k sites, bond dimension 2
    (reference control_Hphase_mpo, src/circuits/qft_gates.jl:43-97).

    Site 1 acts as H then projects the outcome bit c onto the bond; site l
    (1 < l < k) applies P(2*pi/2^l) iff c = 1; site k applies P(2*pi/2^k).
    """
    if k < 1:
        raise ValueError(f"control_Hphase_mpo: k must be >= 1, got {k}")
    if k == 1:
        return MPO.from_core_list([H.astype(dtype).reshape(1, 2, 2, 1)])
    cores = []
    c0 = np.zeros((1, 2, 2, 2), dtype=dtype)
    for c in range(2):
        c0[0, :, :, c] = proj(c) @ H
    cores.append(c0)
    for l in range(2, k):
        W = np.zeros((2, 2, 2, 2), dtype=dtype)
        W[0, :, :, 0] = I2
        W[1, :, :, 1] = P(2 * np.pi / 2**l)
        cores.append(W)
    Wk = np.zeros((2, 2, 2, 1), dtype=dtype)
    Wk[0, :, :, 0] = I2
    Wk[1, :, :, 0] = P(2 * np.pi / 2**k)
    cores.append(Wk)
    return MPO.from_core_list(cores)
