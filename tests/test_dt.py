"""Damping-transform oracle tests (mirrors reference
test/test_dt_transformer.jl: full basis-state sweeps vs the analytic kernel
(1/sqrt N) e^{-wr k j / N}, and the bond plateau)."""

import numpy as np
import pytest

from qilaplace_tpu import apply, build_dt_mpo, mps_to_vector, signal_ztmps
from qilaplace_tpu.core.mpo import max_bond
from qilaplace_tpu.utils.bits import int_to_bits

from helpers import analytical_dt, basis_state


def dt_output_main_vector(psi_out, copy_bits, n):
    """Project the copy register onto ``copy_bits`` and read the main
    register in bit-reversed (LSB-first) order — the DT output convention
    (reference test ztmps_to_main_vector with reverse_bits=true)."""
    vec = np.asarray(mps_to_vector(psi_out))
    arr = vec.reshape((2,) * (2 * n))
    sl = []
    for i in range(n):
        sl.append(slice(None))
        sl.append(copy_bits[i])
    sub = arr[tuple(sl)]
    N = 2**n
    out = np.zeros(N, dtype=complex)
    for k in range(N):
        kb = int_to_bits(k, n, order="lsb")
        out[k] = sub[tuple(kb)]
    return out


@pytest.mark.parametrize("n", [1, 2, 3, 4])
@pytest.mark.parametrize("wr", [0.0, 0.75, 1.0, 2.0, 5.0])
def test_dt_on_basis_states(n, wr):
    N = 2**n
    W = build_dt_mpo(n, wr, cutoff=1e-14)
    for j in range(N):
        x = basis_state(j, n)
        psi = signal_ztmps(x, cutoff=1e-14)
        out = apply(W, psi)
        bits = int_to_bits(j, n)
        got = dt_output_main_vector(out, bits, n)
        expected = analytical_dt(x, wr)
        err = np.linalg.norm(got - expected)
        assert err <= 1e-7 * max(1.0, np.linalg.norm(expected))


def test_dt_linear_on_general_signal():
    n, wr = 3, 1.3
    rng = np.random.default_rng(0)
    x = rng.normal(size=2**n)
    W = build_dt_mpo(n, wr, cutoff=1e-14)
    psi = signal_ztmps(x, cutoff=1e-14)
    out = apply(W, psi)
    # checking one copy-projection column: copy register keeps |j>, so
    # projecting onto j-bits selects the x_j contribution only
    for j in range(2**n):
        bits = int_to_bits(j, n)
        got = dt_output_main_vector(out, bits, n)
        expected = analytical_dt(basis_state(j, n) * x[j], wr)
        assert np.linalg.norm(got - expected) < 1e-8 * max(1.0, abs(x[j]))


def test_dt_bond_plateau():
    # D_max ~ 17-18 plateau (reference docs/src/benchmarking.md:214-216)
    for n, expect_max in [(8, 20), (10, 20)]:
        W = build_dt_mpo(n, 2 * np.pi, cutoff=1e-15, chi=32)
        mb = int(max_bond(W))
        assert 10 <= mb <= expect_max, mb


def test_dt_wr_zero_keeps_uniform_kernel():
    # wr = 0: DT reduces to (1/sqrt N) * all-ones kernel on the main register
    n = 2
    x = basis_state(1, n)
    W = build_dt_mpo(n, 0.0, cutoff=1e-14)
    out = apply(W, signal_ztmps(x, cutoff=1e-14))
    got = dt_output_main_vector(out, int_to_bits(1, n), n)
    assert np.allclose(got, np.ones(4) / 2.0, atol=1e-10)
