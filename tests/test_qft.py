"""QFT transform oracle tests (mirrors reference test/test_qft_transformer.jl:
Q_n basis-state sweeps, full DFT via bit reversal, FFT cross-validation, and
the D_max = 8 bond plateau)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qilaplace_tpu import (
    apply,
    build_qft_mpo,
    mpo_to_dense,
    mps_to_vector,
    signal_mps,
)
from qilaplace_tpu.core.mpo import max_bond
from qilaplace_tpu.utils.bits import bit_reversal_permutation

from helpers import dft_matrix, qn_matrix, basis_state


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_qft_mpo_equals_qn_matrix(n):
    W = build_qft_mpo(n, cutoff=1e-14)
    dense = np.asarray(mpo_to_dense(W))
    assert np.allclose(dense, qn_matrix(n), atol=1e-10)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_qft_on_basis_states(n):
    W = build_qft_mpo(n, cutoff=1e-14)
    Q = qn_matrix(n)
    for j in range(2**n):
        psi = signal_mps(basis_state(j, n), cutoff=0.0)
        out = apply(W, psi)
        got = np.asarray(mps_to_vector(out))
        assert np.linalg.norm(got - Q[:, j]) < 1e-10


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_bit_reversal_gives_full_dft(n):
    W = build_qft_mpo(n, cutoff=1e-14)
    rng = np.random.default_rng(n)
    sig = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    psi = signal_mps(sig, cutoff=0.0)
    out = apply(W, psi)
    qn_vec = np.asarray(mps_to_vector(out))
    perm = bit_reversal_permutation(n)
    fn_vec = np.zeros_like(qn_vec)
    fn_vec[perm] = qn_vec  # fn[rev(i)] = qn[i]
    expected = dft_matrix(n) @ sig
    assert np.linalg.norm(fn_vec - expected) < 1e-10


def test_mps_to_vector_reverse_is_qft_order():
    # reverse=True reads the QFT output directly in natural frequency order
    n = 4
    rng = np.random.default_rng(7)
    sig = rng.normal(size=2**n)
    W = build_qft_mpo(n, cutoff=1e-14)
    out = apply(W, signal_mps(sig, cutoff=0.0))
    got = np.asarray(mps_to_vector(out, reverse=True))
    expected = np.fft.fft(sig) / np.sqrt(2**n)
    assert np.linalg.norm(got - expected) < 1e-10


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_fft_cross_validation(n):
    rng = np.random.default_rng(100 + n)
    sig = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    psi = signal_mps(sig, cutoff=0.0)
    W = build_qft_mpo(n, cutoff=1e-14)
    out = apply(W, psi)
    qn_vec = np.asarray(mps_to_vector(out))
    perm = bit_reversal_permutation(n)
    fn_vec = np.zeros_like(qn_vec)
    fn_vec[perm] = qn_vec
    expected = np.fft.fft(sig) / np.sqrt(2**n)
    assert np.linalg.norm(fn_vec - expected) < 1e-10


def test_qft_bond_plateau():
    # D_max = 8 for n >= 8 (reference docs/src/benchmarking.md:211-213)
    for n in [8, 10, 12]:
        W = build_qft_mpo(n, cutoff=1e-15)
        assert int(max_bond(W)) == 8


def test_qft_fused_apply_large_n():
    # fused apply at n = 10 matches FFT on a smooth signal
    n = 10
    j = np.arange(2**n)
    sig = np.sin(0.01 * j) * np.exp(-0.001 * j)
    psi = signal_mps(sig, cutoff=1e-12, maxdim=32)
    W = build_qft_mpo(n)
    out = apply(W, psi, maxdim=64, cutoff=1e-12)
    got = np.asarray(mps_to_vector(out, reverse=True))
    expected = np.fft.fft(sig) / np.sqrt(2**n)
    # cutoff bounds the squared truncation weight per split: error scale is
    # sqrt(cutoff) * sqrt(#splits)
    assert np.linalg.norm(got - expected) < 1e-5 * np.linalg.norm(expected)
