"""Gate-level analytic tests (mirrors reference test/test_qft_gates.jl,
test_dt_gates.jl, test_zt_gates.jl: elementary matrices and controlled-gate
MPOs checked against closed-form basis action)."""

import numpy as np

from qilaplace_tpu.circuits.qft_gates import H, P, control_Hphase_mpo, proj
from qilaplace_tpu.circuits.dt_gates import (
    R,
    control_damping_copy_mpo,
    control_damping_mpo,
    dampedH,
)
from qilaplace_tpu.circuits.zt_gates import control_Hphase_ztmps_mpo
from qilaplace_tpu.core.mpo import mpo_to_dense


def test_elementary_gates():
    assert np.allclose(H @ H, np.eye(2))
    assert np.allclose(P(np.pi), np.diag([1, -1]))
    assert np.allclose(P(np.pi / 2), np.diag([1, -1j]))
    assert np.allclose(proj(0) + proj(1), np.eye(2))
    assert np.allclose(dampedH(0.0), np.ones((2, 2)) / np.sqrt(2))
    assert np.allclose(R(0.0), np.eye(2))
    w = 1.3
    assert np.allclose(R(w), np.diag([1, np.exp(-w)]))
    assert np.allclose(dampedH(w)[1, 1], np.exp(-w / 2) / np.sqrt(2))


def _dense(W):
    return np.asarray(mpo_to_dense(W))


def test_control_hphase_closed_form():
    # acting operator: sum_c (P-chain controlled on c) (Pi_c H on site 1)
    for k in [1, 2, 3, 4]:
        got = _dense(control_Hphase_mpo(k))
        expected = np.zeros((2**k, 2**k), dtype=complex)
        for c in range(2):
            op = proj(c) @ H
            for l in range(2, k + 1):
                g = P(2 * np.pi / 2**l) if c == 1 else np.eye(2)
                op = np.kron(op, g)
            expected += op
        if k == 1:
            expected = H.astype(complex)
        assert np.allclose(got, expected, atol=1e-12)


def test_control_damping_closed_form():
    w = 0.9
    n, k = 3, 3
    got = _dense(control_damping_mpo(n, k, w).chain)
    # acting on interleaved [m1,c1,m2,c2,m3,c3]: controls main_3 input bit c,
    # applies R(w*2^{l-k-1}) on main_{l<k}, dH on main_k, identity on copies
    expected = np.zeros((2**6, 2**6), dtype=complex)
    I2 = np.eye(2)
    for c in range(2):
        ops = []
        for l in range(1, k):
            g = R(w * 2.0 ** (l - k - 1)) if c == 1 else I2
            ops.extend([g, I2])
        ops.extend([dampedH(w) @ proj(c), I2])
        op = ops[0]
        for o in ops[1:]:
            op = np.kron(op, o)
        expected += op
    assert np.allclose(got, expected, atol=1e-12)


def test_control_damping_copy_closed_form():
    w = 0.7
    n, k = 3, 1  # window = pairs 1..3 (L = 3)
    got = _dense(control_damping_copy_mpo(n, k, w).chain)
    L = n - k + 1
    I2 = np.eye(2)
    expected = np.zeros((4**L, 4**L), dtype=complex)
    for c in range(2):
        ops = [I2, proj(c)]  # main_1 identity, copy_1 projector control
        for j in range(2, L + 1):
            g = R(w * 2.0 ** (j - 2)) if c == 1 else I2
            ops.extend([g, I2])
        op = ops[0]
        for o in ops[1:]:
            op = np.kron(op, o)
        expected += op
    assert np.allclose(got, expected, atol=1e-12)


def test_control_hphase_ztmps_closed_form():
    k = 3
    got = _dense(control_Hphase_ztmps_mpo(k).chain)
    I2 = np.eye(2)
    expected = np.zeros((4**k, 4**k), dtype=complex)
    for c in range(2):
        ops = []
        for j in range(1, k):
            theta = 2 * np.pi / 2 ** (k - j + 1)
            g = P(theta) if c == 1 else I2
            ops.extend([I2, g])
        ops.extend([I2, H @ proj(c)])
        op = ops[0]
        for o in ops[1:]:
            op = np.kron(op, o)
        expected += op
    assert np.allclose(got, expected, atol=1e-12)


def test_gate_mpo_bond_dims():
    from qilaplace_tpu.core.mpo import max_bond

    assert int(max_bond(control_Hphase_mpo(5))) == 2
    assert int(max_bond(control_damping_mpo(4, 4, 1.0))) == 2
    assert int(max_bond(control_damping_copy_mpo(4, 2, 1.0))) == 2
    assert int(max_bond(control_Hphase_ztmps_mpo(4))) == 2
