"""Device-path complex linalg (the TPU fallback for missing complex
SVD/eigh — Jacobi eigensolver + complete-Gram SVD + interleaved-embedding
CholeskyQR), forced on and validated against LAPACK on CPU — including
degenerate spectra, the hard case for cluster resolution."""

import numpy as np
import jax.numpy as jnp
import pytest

import qilaplace_tpu.ops.complexlinalg as cl


@pytest.fixture
def forced_embedding():
    cl.FORCE_DEVICE_PATH = True
    yield
    cl.FORCE_DEVICE_PATH = False


def _rand_hermitian(n, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    return (M + M.conj().T) / 2


def test_ceigh_random(forced_embedding):
    H = jnp.asarray(_rand_hermitian(24, 1))
    lam, V = cl.ceigh(H)
    lam, V = np.asarray(lam), np.asarray(V)
    ref = np.linalg.eigvalsh(np.asarray(H))
    assert np.allclose(lam, ref, atol=1e-10)
    assert np.allclose(V.conj().T @ V, np.eye(24), atol=1e-10)
    assert np.allclose(np.asarray(H) @ V, V @ np.diag(lam), atol=1e-9)


def test_ceigh_degenerate(forced_embedding):
    # eigenvalues with multiplicities (1, 2, 3) — clusters of size 2, 4, 6
    # in the embedding
    rng = np.random.default_rng(3)
    Q = np.linalg.qr(rng.normal(size=(6, 6)) + 1j * rng.normal(size=(6, 6)))[0]
    lam_true = np.array([1.0, 2.0, 2.0, 5.0, 5.0, 5.0])
    H = jnp.asarray(Q @ np.diag(lam_true) @ Q.conj().T)
    lam, V = cl.ceigh(H)
    lam, V = np.asarray(lam), np.asarray(V)
    assert np.allclose(np.sort(lam), lam_true, atol=1e-10)
    assert np.allclose(V.conj().T @ V, np.eye(6), atol=1e-8)
    assert np.allclose(np.asarray(H) @ V, V @ np.diag(lam), atol=1e-8)


def test_csvd_random_both_orientations(forced_embedding):
    rng = np.random.default_rng(4)
    for shape in [(16, 40), (40, 16), (20, 20)]:
        M = jnp.asarray(
            rng.normal(size=shape) + 1j * rng.normal(size=shape)
        )
        U, s, Vh = cl.csvd(M)
        U, s, Vh = np.asarray(U), np.asarray(s), np.asarray(Vh)
        ref = np.linalg.svd(np.asarray(M), compute_uv=False)
        assert np.allclose(s, ref, atol=1e-9)
        assert np.allclose(U @ np.diag(s) @ Vh, np.asarray(M), atol=1e-8)
        k = min(shape)
        assert np.allclose(U.conj().T @ U, np.eye(k), atol=1e-8)
        assert np.allclose(Vh @ Vh.conj().T, np.eye(k), atol=1e-7)


def test_csvd_repeated_singular_values(forced_embedding):
    # unitary-like operator: all singular values equal — worst case for the
    # embedding pair selection
    rng = np.random.default_rng(5)
    Q1 = np.linalg.qr(rng.normal(size=(12, 12)) + 1j * rng.normal(size=(12, 12)))[0]
    M = jnp.asarray(3.0 * Q1)
    U, s, Vh = cl.csvd(M)
    U, s, Vh = np.asarray(U), np.asarray(s), np.asarray(Vh)
    assert np.allclose(s, 3.0, atol=1e-8)
    assert np.allclose(U @ np.diag(s) @ Vh, np.asarray(M), atol=1e-7)
    assert np.allclose(U.conj().T @ U, np.eye(12), atol=1e-7)


def test_csvd_zero_padded(forced_embedding):
    rng = np.random.default_rng(6)
    M = np.zeros((16, 12), dtype=complex)
    M[:9, :7] = rng.normal(size=(9, 7)) + 1j * rng.normal(size=(9, 7))
    U, s, Vh = cl.csvd(jnp.asarray(M))
    rec = np.asarray(U) @ np.diag(np.asarray(s)) @ np.asarray(Vh)
    assert np.allclose(rec, M, atol=1e-8)


def test_chol_qr_full_rank_and_zero(forced_embedding):
    # full-column-rank Y: orthonormal to working precision
    rng = np.random.default_rng(8)
    Y = jnp.asarray(rng.normal(size=(64, 12)) + 1j * rng.normal(size=(64, 12)))
    Q = np.asarray(cl.chol_qr(Y))
    assert np.allclose(Q.conj().T @ Q, np.eye(12), atol=1e-12)
    # regression: Cholesky of the zero Gram is NaN without the absolute floor
    Q = np.asarray(cl.chol_qr(jnp.zeros((32, 8), dtype=jnp.complex128)))
    assert np.all(np.isfinite(Q))
    # rank-deficient input is OUT OF CONTRACT for chol_qr (it amplifies noise
    # directions); the sketch/zip paths use gram_orthonormalize instead, and
    # must stay finite here regardless
    u = rng.normal(size=(64, 1)) + 1j * rng.normal(size=(64, 1))
    v = rng.normal(size=(1, 12)) + 1j * rng.normal(size=(1, 12))
    Q = np.asarray(cl.chol_qr(jnp.asarray(1e6 * u @ v)))
    assert np.all(np.isfinite(Q))


def test_gram_orthonormalize_rank_deficient(forced_embedding):
    rng = np.random.default_rng(9)
    Y = jnp.asarray(
        (rng.normal(size=(96, 2)) + 1j * rng.normal(size=(96, 2)))
        @ (rng.normal(size=(2, 24)) + 1j * rng.normal(size=(2, 24)))
    )
    Q, rank = cl.gram_orthonormalize(Y)
    Q = np.asarray(Q)
    assert int(rank) == 2
    assert np.allclose(Q[:, 2:], 0.0)  # exact zero padding
    assert np.allclose(Q[:, :2].conj().T @ Q[:, :2], np.eye(2), atol=1e-10)


@pytest.mark.slow
def test_end_to_end_transforms_with_embedding(forced_embedding):
    # the QFT pipeline must survive entirely on the embedding path
    from qilaplace_tpu import apply, build_qft_mpo, mps_to_vector, signal_mps
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import qn_matrix

    n = 4
    rng = np.random.default_rng(7)
    sig = rng.normal(size=2**n)
    psi = signal_mps(sig, cutoff=1e-13)
    W = build_qft_mpo(n, cutoff=1e-13)
    out = apply(W, psi, maxdim=16, cutoff=1e-13)
    got = np.asarray(mps_to_vector(out))
    expected = qn_matrix(n) @ sig
    assert np.linalg.norm(got - expected) < 1e-6
