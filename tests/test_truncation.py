import pytest
import numpy as np
import jax.numpy as jnp
import jax

from qilaplace_tpu.ops.truncation import (
    truncated_svd,
    truncation_rank,
    svd_split,
    orthogonal_split,
)
from qilaplace_tpu.ops.rsvd import rsvd, gram_orthonormalize


def _padded_lowrank(a, b, ra, rb, rank, seed=0):
    """Zero-padded [a, b] matrix whose valid [ra, rb] block has given rank."""
    rng = np.random.default_rng(seed)
    L = rng.normal(size=(ra, rank)) + 1j * rng.normal(size=(ra, rank))
    R = rng.normal(size=(rank, rb)) + 1j * rng.normal(size=(rank, rb))
    M = np.zeros((a, b), dtype=complex)
    M[:ra, :rb] = L @ R
    return jnp.asarray(M)


def test_truncation_rank_rule():
    s = jnp.asarray([2.0, 1.0, 1e-3, 0.0])
    # relative squared cutoff: discarding the 1e-3 loses 1e-6/5 ~ 2e-7 weight
    assert int(truncation_rank(s, 1e-5, 10)) == 2
    assert int(truncation_rank(s, 0.0, 10)) == 3  # exact zeros dropped
    assert int(truncation_rank(s, 1.0, 10, mindim=2)) == 2
    assert int(truncation_rank(s, 0.0, 1)) == 1


def test_truncated_svd_reconstructs_and_masks():
    M = _padded_lowrank(16, 12, 9, 7, rank=4)
    U, s, Vh, rank = truncated_svd(M, cutoff=1e-12)
    assert int(rank) == 4
    rec = U @ jnp.diag(s) @ Vh
    assert np.allclose(np.asarray(rec), np.asarray(M), atol=1e-10)
    # masked region is exactly zero
    assert np.all(np.asarray(U)[:, 4:] == 0)
    assert np.all(np.asarray(Vh)[4:, :] == 0)
    # zero rows of M stay zero in U
    assert np.all(np.asarray(U)[9:, :] == 0)


def test_svd_split_out_dim():
    M = _padded_lowrank(8, 8, 8, 8, rank=3)
    for absorb in ("left", "right", "both"):
        L, R, rank = svd_split(M, cutoff=1e-12, absorb=absorb, out_dim=5)
        assert L.shape == (8, 5) and R.shape == (5, 8)
        assert int(rank) == 3
        assert np.allclose(np.asarray(L @ R), np.asarray(M), atol=1e-10)


def test_orthogonal_split_isometry():
    M = _padded_lowrank(10, 6, 7, 5, rank=2)
    Q, C, rank = orthogonal_split(M, side="left")
    # cutoff=0 keeps numerically-tiny noise values, so rank >= true rank
    assert int(rank) >= 2
    QhQ = np.asarray(Q.conj().T @ Q)
    assert np.allclose(QhQ[:2, :2], np.eye(2), atol=1e-10)
    assert np.allclose(np.asarray(Q @ C), np.asarray(M), atol=1e-10)


def test_gram_orthonormalize_padding_safe():
    M = _padded_lowrank(32, 10, 20, 8, rank=5, seed=3)
    Q, rank = gram_orthonormalize(M)
    Qn = np.asarray(Q)
    r = int(rank)
    assert r == 5
    assert np.allclose(Qn[:, :r].conj().T @ Qn[:, :r], np.eye(r), atol=1e-8)
    assert np.all(Qn[:, r:] == 0)
    assert np.all(Qn[20:, :] == 0)  # zero rows preserved


def test_rsvd_reconstruction():
    M = _padded_lowrank(64, 48, 64, 48, rank=6, seed=1)
    key = jax.random.PRNGKey(0)
    U, s, Vh, rank = rsvd(M, key, k=10, p=5, q=1, cutoff=1e-12)
    assert int(rank) == 6
    rec = np.asarray(U @ jnp.diag(s) @ Vh)
    assert np.allclose(rec, np.asarray(M), atol=1e-8 * np.linalg.norm(np.asarray(M)))


def test_rsvd_k_caps_rank():
    M = _padded_lowrank(32, 32, 32, 32, rank=10, seed=2)
    U, s, Vh, rank = rsvd(M, jax.random.PRNGKey(1), k=4, p=2, q=2, cutoff=0.0)
    assert int(rank) <= 4
    # best rank-4 approx error should be moderate but structured
    rec = np.asarray(U @ jnp.diag(s) @ Vh)
    sv = np.linalg.svd(np.asarray(M), compute_uv=False)
    best = np.sqrt(np.sum(sv[4:] ** 2))
    err = np.linalg.norm(rec - np.asarray(M))
    assert err <= 3 * best + 1e-9


def test_rsvd_power_iterations_improve():
    # slowly decaying spectrum
    rng = np.random.default_rng(7)
    U0, _ = np.linalg.qr(rng.normal(size=(64, 64)))
    V0, _ = np.linalg.qr(rng.normal(size=(64, 64)))
    s0 = 1.0 / np.arange(1, 65) ** 0.5
    M = jnp.asarray(U0 @ np.diag(s0) @ V0.T)
    errs = []
    for q in (0, 3):
        U, s, Vh, _ = rsvd(M, jax.random.PRNGKey(5), k=8, p=2, q=q, cutoff=0.0)
        errs.append(np.linalg.norm(np.asarray(U @ jnp.diag(s) @ Vh) - np.asarray(M)))
    assert errs[1] <= errs[0] + 1e-12


def test_sketched_split_no_norm_leak_rank_deficient():
    # regression: the zip-up sweep feeds chronically rank-deficient wide
    # matrices to the sketched device route; the left factor must stay
    # orthonormal (norm leak compounded exponentially across the chain)
    import qilaplace_tpu.ops.complexlinalg as cl

    M = _padded_lowrank(128, 1024, 128, 1024, rank=2, seed=11)
    cl.FORCE_DEVICE_PATH = True
    try:
        L, R, rank = svd_split(
            M, cutoff=0.0, maxdim=32, absorb="right", out_dim=32
        )
    finally:
        cl.FORCE_DEVICE_PATH = False
    L, R = np.asarray(L), np.asarray(R)
    assert np.all(np.isfinite(L)) and np.all(np.isfinite(R))
    # valid L columns orthonormal; no column exceeds unit norm
    assert np.max(np.linalg.norm(L, axis=0)) < 1.0 + 1e-8
    # the product reconstructs M (rank 2 fits easily in maxdim 32)
    err = np.linalg.norm(L @ R - np.asarray(M)) / np.linalg.norm(np.asarray(M))
    assert err < 1e-8


@pytest.mark.slow
def test_device_dt_build_matches_native():
    # the full fused MPO build must agree between the native (LAPACK) and
    # device (Jacobi/Gram/sketch) linalg routes
    import qilaplace_tpu.ops.complexlinalg as cl
    from qilaplace_tpu.transforms.dt import build_dt_mpo
    from qilaplace_tpu.core.mpo import mpo_to_dense

    n, wr = 3, 0.75
    Wn = np.asarray(mpo_to_dense(build_dt_mpo(n, wr, cutoff=1e-14)))
    cl.FORCE_DEVICE_PATH = True
    try:
        jax.clear_caches()
        Wd = np.asarray(mpo_to_dense(build_dt_mpo(n, wr, cutoff=1e-14)))
    finally:
        cl.FORCE_DEVICE_PATH = False
        jax.clear_caches()
    assert np.max(np.abs(Wn - Wd)) < 1e-9
