"""Analytic (cross-interpolated) transform builders vs their kernels and the
gate-layer builders (transforms/analytic.py; no reference counterpart — the
reference constructs every MPO by gate-layer folding,
src/transforms/zt_transformer.jl:41-106)."""

import numpy as np
import pytest

from qilaplace_tpu import (
    analytic_dt_mpo,
    analytic_qft_mpo,
    analytic_zt_mpo,
    apply,
    mpo_to_dense,
    mps_to_vector,
    signal_ztmps,
)
from qilaplace_tpu.core.mpo import max_bond
from qilaplace_tpu.ops.apply import apply_coefficient_batch
from qilaplace_tpu.transforms.analytic import cross_tt, zt_kernel

from helpers import analytical_zt, basis_state, paired_vector_to_grid, qn_matrix


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 6])
def test_analytic_qft_equals_qn_matrix(n):
    W = analytic_qft_mpo(n, cutoff=1e-24, dtype=np.complex128)
    dense = np.asarray(mpo_to_dense(W))
    assert np.abs(dense - qn_matrix(n)).max() < 1e-12


@pytest.mark.parametrize("n", [1, 2, 3])
@pytest.mark.parametrize("wr", [0.0, 0.75, 2.0, 2 * np.pi])
def test_analytic_zt_on_basis_states(n, wr):
    N = 2**n
    W = analytic_zt_mpo(n, wr, cutoff=1e-24, dtype=np.complex128)
    for j in range(N):
        x = basis_state(j, n)
        out = apply(W, signal_ztmps(x, cutoff=1e-14))
        Z = paired_vector_to_grid(np.asarray(mps_to_vector(out)), n)
        assert np.linalg.norm(Z - analytical_zt(x, wr)) <= 1e-10


@pytest.mark.parametrize("wr", [0.75, 2 * np.pi])
def test_analytic_zt_random_signal(wr):
    n = 4
    rng = np.random.default_rng(11)
    x = rng.normal(size=2**n)
    # maxdim=256 keeps the full exact center bond of the 8-site operator
    # (the default 160 would truncate it at the ~1e-8 level)
    W = analytic_zt_mpo(n, wr, cutoff=1e-24, maxdim=256, dtype=np.complex128)
    out = apply(W, signal_ztmps(x, cutoff=1e-14))
    Z = paired_vector_to_grid(np.asarray(mps_to_vector(out)), n)
    Z_ref = analytical_zt(x, wr)
    assert np.linalg.norm(Z - Z_ref) <= 1e-10 * max(1.0, np.linalg.norm(Z_ref))


def test_analytic_dt_matches_damped_kernel():
    # DT action on |x>_pair: out(k, j) = x_j e^{-wr k j / N} / sqrt(N) with
    # the main register read LSB-first and the copy register UNTOUCHED —
    # still MSB-first |j> (the DT output convention, tests/test_dt.py
    # dt_output_main_vector; only the zT reads both registers LSB-first).
    n, wr = 3, 0.75
    N = 2**n
    rng = np.random.default_rng(3)
    x = rng.normal(size=N)
    W = analytic_dt_mpo(n, wr, cutoff=1e-24, dtype=np.complex128)
    out = apply(W, signal_ztmps(x, cutoff=1e-14))
    vec = np.asarray(mps_to_vector(out))
    arr = vec.reshape((2,) * (2 * n))
    Z = np.zeros((N, N), dtype=complex)
    for k in range(N):
        kb = [(k >> i) & 1 for i in range(n)]  # main: LSB-first
        for j in range(N):
            jb = [(j >> (n - 1 - i)) & 1 for i in range(n)]  # copy: MSB
            idx = []
            for i in range(n):
                idx.extend([kb[i], jb[i]])
            Z[k, j] = arr[tuple(idx)]
    k, j = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    want = x[j] * np.exp(-wr * k * j / N) / np.sqrt(N)
    assert np.abs(Z - want).max() < 1e-10


@pytest.mark.slow
def test_analytic_zt_direct_readout_matches_gate_build():
    # The analytic and gate-layer operators agree on the paired subspace;
    # compare the scanned coefficients of a structured signal.
    from qilaplace_tpu import build_zt_mpo

    n, wr = 6, 2 * np.pi
    N = 2**n
    jj = np.arange(N)
    x = np.exp(-0.02 * jj) * np.sin(0.3 * jj)
    psi = signal_ztmps(x, cutoff=1e-14)
    Wa = analytic_zt_mpo(n, wr, cutoff=1e-24, dtype=np.complex128)
    Wg = build_zt_mpo(n, wr, cutoff=1e-20, dtype=np.complex128)
    rng = np.random.default_rng(0)
    ks = rng.integers(0, N, 64)
    ls = rng.integers(0, N, 64)
    kb = ((ks[:, None] >> np.arange(n)) & 1).astype(np.int32)
    lb = ((ls[:, None] >> np.arange(n)) & 1).astype(np.int32)
    cfg = np.stack([kb, lb], axis=2).reshape(64, 2 * n)
    va = np.asarray(apply_coefficient_batch(Wa, psi, cfg))
    vg = np.asarray(apply_coefficient_batch(Wg, psi, cfg))
    assert np.abs(va - vg).max() <= 1e-9 * max(np.abs(vg).max(), 1e-30)


@pytest.mark.slow
def test_analytic_zt_matches_gate_build_n12():
    # Quantitative at-scale cross-validation (round-3 verdict #5): the
    # analytic and gate-built operators must agree on scanned coefficients
    # of a structured signal to 1e-8 at n=12 (both c128, tight cutoffs).
    from qilaplace_tpu import build_zt_mpo

    n, wr = 12, 2 * np.pi
    N = 2**n
    jj = np.arange(N)
    x = np.exp(-4.0 * jj / N) * np.sin(0.02 * jj)
    psi = signal_ztmps(x, cutoff=1e-14, maxdim=128)
    Wa = analytic_zt_mpo(n, wr, cutoff=1e-24, maxdim=256,
                         dtype=np.complex128)
    Wg = build_zt_mpo(n, wr, cutoff=1e-20, maxdim=256, dtype=np.complex128)
    rng = np.random.default_rng(0)
    B = 96
    ks = np.concatenate([rng.integers(0, 64, B // 2),
                         rng.integers(0, N, B // 2)])
    ls = rng.integers(0, N, B)
    kb = ((ks[:, None] >> np.arange(n)) & 1).astype(np.int32)
    lb = ((ls[:, None] >> np.arange(n)) & 1).astype(np.int32)
    cfg = np.stack([kb, lb], axis=2).reshape(B, 2 * n)
    va = np.asarray(apply_coefficient_batch(Wa, psi, cfg))
    vg = np.asarray(apply_coefficient_batch(Wg, psi, cfg))
    scale = max(np.abs(vg).max(), 1e-30)
    assert np.abs(va - vg).max() <= 1e-8 * scale


def test_analytic_zt_rank_plateau():
    # cross ranks level off with n (smooth-kernel low-rank structure)
    r10 = int(max_bond(analytic_zt_mpo(10, 2 * np.pi, cutoff=1e-12)))
    r14 = int(max_bond(analytic_zt_mpo(14, 2 * np.pi, cutoff=1e-12)))
    assert r10 <= 64 and r14 <= 64
    assert abs(r14 - r10) <= 6


def test_zt_pack_assembly_matches_direct_build():
    # the factor pack's on-device kron assembly must be BIT-EXACT vs the
    # host-assembled analytic operator (same rails, same selection)
    from qilaplace_tpu.transforms.analytic import (
        zt_mpo_from_pack,
        zt_product_pack,
    )

    n, wr = 8, 2 * np.pi
    W_ref = analytic_zt_mpo(n, wr, cutoff=1e-12, maxdim=160,
                            dtype=np.complex128)
    pack = zt_product_pack(n, wr, cutoff=1e-12, maxdim=160)
    W_dev = zt_mpo_from_pack(pack, dtype=np.complex128)
    assert np.array_equal(np.asarray(W_ref.chain.ranks),
                          np.asarray(W_dev.chain.ranks))
    a = np.asarray(W_ref.chain.cores)
    b = np.asarray(W_dev.chain.cores)
    m = min(a.shape[1], b.shape[1])
    assert np.abs(a[:, :m, :, :, :m] - b[:, :m, :, :, :m]).max() == 0.0


def test_cross_tt_validation_guard():
    # under-resourced cross must fail loudly, not return a bad operator
    with pytest.raises(RuntimeError):
        analytic_zt_mpo(8, 2 * np.pi, cutoff=1e-12, maxdim=8,
                        validate_tol=1e-8)


def test_zt_kernel_values():
    # spot-check the kernel addressing: config = interleave(lsb k, lsb l)
    # out bits with msb j_main, j_copy in bits
    n = 3
    N = 2**n
    f = zt_kernel(n, 0.75)
    k, l, j = 5, 3, 6
    kb = [(k >> s) & 1 for s in range(n)]
    lb = [(l >> s) & 1 for s in range(n)]
    jb = [(j >> (n - 1 - s)) & 1 for s in range(n)]
    cfg = np.zeros((1, 2 * n), dtype=np.int64)
    for s in range(n):
        cfg[0, 2 * s] = 2 * kb[s] + jb[s]
        cfg[0, 2 * s + 1] = 2 * lb[s] + jb[s]
    want = np.exp(-(0.75 * k + 2j * np.pi * l) * j / N) / N
    assert abs(f(cfg)[0] - want) < 1e-14
