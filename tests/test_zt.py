"""z-transform oracle tests (mirrors reference test/test_zt_transformer.jl:
basis-state sweeps vs the analytic chi(k, l) grid, plus readout-convention
and bond-plateau checks)."""

import numpy as np
import pytest

from qilaplace_tpu import (
    apply,
    build_zt_mpo,
    coefficient,
    mps_to_vector,
    signal_ztmps,
)
from qilaplace_tpu.core.mpo import max_bond
from qilaplace_tpu.scan.pole_scan import chi_grid

from helpers import analytical_zt, basis_state, paired_vector_to_grid


@pytest.mark.parametrize("n", [1, 2, 3])
@pytest.mark.parametrize("wr", [0.0, 0.75, 1.0, 2.0, 5.0])
def test_zt_on_basis_states(n, wr):
    N = 2**n
    W = build_zt_mpo(n, wr, cutoff=1e-14)
    for j in range(N):
        x = basis_state(j, n)
        psi = signal_ztmps(x, cutoff=1e-14)
        out = apply(W, psi)
        vec = np.asarray(mps_to_vector(out))
        Z = paired_vector_to_grid(vec, n)
        Z_ref = analytical_zt(x, wr)
        assert np.linalg.norm(Z - Z_ref) <= 2e-7


@pytest.mark.parametrize("wr", [0.75, 2.0])
def test_zt_n4_random_signal(wr):
    n = 4
    rng = np.random.default_rng(11)
    x = rng.normal(size=2**n)
    W = build_zt_mpo(n, wr, cutoff=1e-14)
    out = apply(W, signal_ztmps(x, cutoff=1e-14))
    Z = paired_vector_to_grid(np.asarray(mps_to_vector(out)), n)
    Z_ref = analytical_zt(x, wr)
    assert np.linalg.norm(Z - Z_ref) <= 1e-6 * max(1.0, np.linalg.norm(Z_ref))


def test_chi_grid_readout_matches_dense():
    n, wr = 3, 1.0
    rng = np.random.default_rng(5)
    x = rng.normal(size=2**n)
    W = build_zt_mpo(n, wr, cutoff=1e-14)
    out = apply(W, signal_ztmps(x, cutoff=1e-14))
    N = 2**n
    grid = np.asarray(chi_grid(out, np.arange(N), np.arange(N)))
    Z_ref = analytical_zt(x, wr)
    assert np.allclose(grid, Z_ref, atol=1e-8)


def test_coefficient_interleaved_readout():
    # chi(k, l) = coefficient at interleaved LSB-first bits
    # (reference docs/src/tutorials/zt.jl:152-157)
    from qilaplace_tpu.utils.bits import int_to_bits, interleave_bits

    n, wr = 2, 2.0
    x = np.array([1.0, -0.5, 0.25, 0.7])
    W = build_zt_mpo(n, wr, cutoff=1e-14)
    out = apply(W, signal_ztmps(x, cutoff=1e-14))
    Z_ref = analytical_zt(x, wr)
    for k in range(4):
        for l in range(4):
            cfg = interleave_bits(
                int_to_bits(k, n, order="lsb"), int_to_bits(l, n, order="lsb")
            )
            got = complex(coefficient(out, np.asarray(cfg)))
            assert abs(got - Z_ref[k, l]) < 1e-9


@pytest.mark.slow
def test_zt_bond_plateau():
    # D_max ~ 89-92 from m >~ 18 (reference docs/src/benchmarking.md:216-219):
    # the canonical compression must land near the plateau, NOT pin at the
    # chi=128 cap (the round-1 regression: a zip-up truncating at the cap
    # injected non-canonical noise above the cutoff)
    W = build_zt_mpo(8, 2 * np.pi, cutoff=1e-15, chi=128)
    mb = int(max_bond(W))
    assert 80 <= mb <= 100, mb


def test_zt_bond_plateau_n10():
    W = build_zt_mpo(10, 2 * np.pi, cutoff=1e-15, chi=128)
    mb = int(max_bond(W))
    assert 85 <= mb <= 100, mb


@pytest.mark.slow
def test_zt_fused_apply_matches_exact():
    n, wr = 4, 1.0
    rng = np.random.default_rng(21)
    x = rng.normal(size=2**n)
    psi = signal_ztmps(x, cutoff=1e-14)
    W = build_zt_mpo(n, wr, cutoff=1e-14)
    exact = np.asarray(mps_to_vector(apply(W, psi)))
    fused = np.asarray(
        mps_to_vector(apply(W, psi, maxdim=64, cutoff=1e-14))
    )
    assert np.linalg.norm(fused - exact) < 1e-6 * np.linalg.norm(exact)
