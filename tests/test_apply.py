import numpy as np
import jax.numpy as jnp
import pytest

from qilaplace_tpu import (
    MPS,
    apply,
    apply_mpo_mpo,
    identity_mpo,
    mpo_to_dense,
    mps_to_vector,
    signal_mps,
)
from qilaplace_tpu.core.mpo import MPO
from qilaplace_tpu.ops.apply import embed_window, mpo_compress


def random_mpo(n, chi_true=2, seed=0):
    rng = np.random.default_rng(seed)
    cores = []
    r_prev = 1
    for i in range(n):
        r_next = 1 if i == n - 1 else chi_true
        c = rng.normal(size=(r_prev, 2, 2, r_next)) + 1j * rng.normal(
            size=(r_prev, 2, 2, r_next)
        )
        cores.append(c)
        r_prev = r_next
    return MPO.from_core_list(cores)


def test_identity_apply():
    x = np.random.default_rng(0).normal(size=32)
    psi = signal_mps(x, cutoff=0.0)
    W = identity_mpo(5, chi=psi.chi, dtype=psi.dtype)
    out = apply(W, psi)
    assert np.allclose(np.asarray(mps_to_vector(out)), x, atol=1e-12)


def test_apply_matches_dense():
    n = 4
    x = np.random.default_rng(1).normal(size=2**n)
    psi = signal_mps(x, cutoff=0.0)
    W = random_mpo(n, chi_true=3, seed=2)
    out = apply(W, psi)
    dense_W = np.asarray(mpo_to_dense(W))
    expected = dense_W @ x
    got = np.asarray(mps_to_vector(out))
    assert np.allclose(got, expected, atol=1e-10)


def test_apply_fused_matches_exact():
    n = 5
    x = np.random.default_rng(3).normal(size=2**n)
    psi = signal_mps(x, cutoff=0.0)
    W = random_mpo(n, chi_true=3, seed=4)
    exact = np.asarray(mps_to_vector(apply(W, psi)))
    fused = np.asarray(
        mps_to_vector(apply(W, psi, maxdim=32, cutoff=1e-14))
    )
    assert np.allclose(fused, exact, atol=1e-9 * np.linalg.norm(exact))


def test_apply_coefficient_batch_matches_dense():
    # direct <config| W |psi> zipper == rows of (dense W) @ x, without
    # forming the product state (the accuracy-critical pole-scan readout)
    from qilaplace_tpu.ops.apply import apply_coefficient_batch

    n = 5
    x = np.random.default_rng(7).normal(size=2**n)
    psi = signal_mps(x, cutoff=0.0)
    W = random_mpo(n, chi_true=3, seed=8)
    expected_full = np.asarray(mpo_to_dense(W)) @ x
    idx = np.array([0, 1, 5, 17, 2**n - 1])
    # site 1 = MSB: config bit j is the (n-1-j)-th binary digit
    cfg = ((idx[:, None] >> np.arange(n)[::-1]) & 1).astype(np.int32)
    got = np.asarray(apply_coefficient_batch(W, psi, cfg))
    assert np.allclose(got, expected_full[idx], atol=1e-10)


def test_apply_fused_truncation_caps_rank():
    n = 6
    x = np.random.default_rng(5).normal(size=2**n)
    psi = signal_mps(x, cutoff=0.0)
    W = random_mpo(n, chi_true=2, seed=6)
    out = apply(W, psi, maxdim=4, cutoff=1e-12)
    assert int(jnp.max(out.ranks)) <= 4


def test_apply_length_mismatch_raises():
    psi = signal_mps(np.ones(8))
    W = random_mpo(4)
    with pytest.raises(ValueError):
        apply(W, psi)


def test_mpo_composition_dense():
    n = 3
    A = random_mpo(n, chi_true=2, seed=7)
    B = random_mpo(n, chi_true=3, seed=8)
    C = apply_mpo_mpo(A, B)  # B after A
    got = np.asarray(mpo_to_dense(C))
    expected = np.asarray(mpo_to_dense(B)) @ np.asarray(mpo_to_dense(A))
    assert np.allclose(got, expected, atol=1e-10)


def test_mpo_composition_fused_matches_exact():
    n = 4
    A = random_mpo(n, chi_true=2, seed=9)
    B = random_mpo(n, chi_true=2, seed=10)
    exact = np.asarray(mpo_to_dense(apply_mpo_mpo(A, B)))
    fused = np.asarray(
        mpo_to_dense(apply_mpo_mpo(A, B, chi_out=8, cutoff=1e-14, maxdim=8))
    )
    assert np.allclose(fused, exact, atol=1e-9 * np.abs(exact).max())


def test_partial_window_composition():
    # reference src/linalg/apply.jl:124-199 (tested at test/test_apply.jl:415):
    # the shorter MPO acts on a window of the longer, identity outside
    n_long = 5
    A = random_mpo(n_long, chi_true=2, seed=30)
    Wwin = random_mpo(2, chi_true=3, seed=31)
    for start in (0, 1, 3):
        C = apply_mpo_mpo(A, Wwin, offset=start)
        got = np.asarray(mpo_to_dense(C))
        w_embedded = np.kron(
            np.kron(np.eye(2**start), np.asarray(mpo_to_dense(Wwin))),
            np.eye(2 ** (n_long - start - 2)),
        )
        expected = w_embedded @ np.asarray(mpo_to_dense(A))
        assert np.allclose(got, expected, atol=1e-10)
        # the longer operand may also come second
        C2 = apply_mpo_mpo(Wwin, A, offset=start)
        got2 = np.asarray(mpo_to_dense(C2))
        assert np.allclose(got2, np.asarray(mpo_to_dense(A)) @ w_embedded,
                           atol=1e-10)


def test_partial_window_composition_errors():
    A = random_mpo(4, chi_true=2, seed=32)
    W = random_mpo(2, chi_true=2, seed=33)
    with pytest.raises(ValueError, match="offset"):
        apply_mpo_mpo(A, W)  # unequal lengths need an explicit offset
    with pytest.raises(ValueError, match="out of range"):
        apply_mpo_mpo(A, W, offset=3)
    with pytest.raises(ValueError, match="offset"):
        apply_mpo_mpo(A, random_mpo(4, seed=34), offset=1)


def test_embed_window_dense():
    n_total = 5
    W = random_mpo(2, chi_true=2, seed=11)
    for start in (0, 2, 3):
        We = embed_window(W, n_total, start)
        dense = np.asarray(mpo_to_dense(We))
        w_dense = np.asarray(mpo_to_dense(W))
        expected = np.kron(
            np.kron(np.eye(2**start), w_dense),
            np.eye(2 ** (n_total - start - 2)),
        )
        assert np.allclose(dense, expected, atol=1e-12)


def test_mpo_compress_preserves_operator():
    n = 4
    A = random_mpo(n, chi_true=2, seed=12)
    B = random_mpo(n, chi_true=2, seed=13)
    C = apply_mpo_mpo(A, B)  # bond 4, padded 8
    dense = np.asarray(mpo_to_dense(C))
    out = mpo_compress(C, cutoff=1e-14, maxdim=8)
    assert np.allclose(np.asarray(mpo_to_dense(out)), dense, atol=1e-9)
    assert int(jnp.max(out.ranks)) <= 4


def test_mul_sugar():
    n = 3
    x = np.random.default_rng(14).normal(size=2**n)
    psi = signal_mps(x, cutoff=0.0)
    W = random_mpo(n, seed=15)
    v1 = np.asarray(mps_to_vector(W * psi))
    v2 = np.asarray(mps_to_vector(apply(W, psi)))
    assert np.allclose(v1, v2)
    A, B = random_mpo(n, seed=16), random_mpo(n, seed=17)
    # W1 * W2 == W2 ∘ W1 (reference convention)
    d = np.asarray(mpo_to_dense(A * B))
    assert np.allclose(
        d, np.asarray(mpo_to_dense(B)) @ np.asarray(mpo_to_dense(A)), atol=1e-10
    )


def test_paired_apply_requires_matching_types():
    from qilaplace_tpu import signal_ztmps

    zt = signal_ztmps(np.ones(8))
    W = random_mpo(6)
    with pytest.raises(TypeError):
        apply(W, zt)


def test_zipper_chain_matches_direct_readout():
    # Kron-combined effective chain == the factored direct zipper (exact
    # reassociation, no truncation anywhere)
    import numpy as np

    from qilaplace_tpu import build_zt_mpo, signal_ztmps
    from qilaplace_tpu.core.mps import coefficient_batch
    from qilaplace_tpu.ops.apply import apply_coefficient_batch, zipper_chain
    from qilaplace_tpu.ops.pallas_kernels import coefficient_batch_pallas
    from qilaplace_tpu.utils.bits import paired_config_from_kl

    n = 4
    x = np.random.default_rng(0).normal(size=2**n)
    psi = signal_ztmps(x, cutoff=1e-14)
    W = build_zt_mpo(n, 0.75, cutoff=1e-14)
    ks = jnp.arange(2**n)
    cfg = paired_config_from_kl(ks, (3 * ks) % 2**n, n)
    direct = np.asarray(apply_coefficient_batch(W, psi, cfg))
    eff = zipper_chain(W, psi)
    fused = np.asarray(coefficient_batch(eff, cfg))
    assert np.abs(direct - fused).max() < 1e-12
    # and through the Pallas kernel in interpret mode (f32 path)
    pal = np.asarray(coefficient_batch_pallas(eff, cfg, interpret=True))
    assert np.abs(direct - pal).max() < 1e-5
