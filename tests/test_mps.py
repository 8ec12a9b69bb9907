import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qilaplace_tpu import (
    MPS,
    ZTMPS,
    canonicalize,
    coefficient,
    coefficient_batch,
    compress,
    mps_to_vector,
    norm,
    signal_mps,
    signal_ztmps,
    siteindices,
    bondindices,
)
from qilaplace_tpu.utils.bits import int_to_bits, int_to_paired_bits


def random_mps(n, chi_true=3, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    cores = []
    r_prev = 1
    for i in range(n):
        r_next = 1 if i == n - 1 else chi_true
        shape = (r_prev, 2, r_next)
        c = rng.normal(size=shape)
        if complex_:
            c = c + 1j * rng.normal(size=shape)
        cores.append(c)
        r_prev = r_next
    return MPS.from_core_list(cores, amplitude=1.0)


def test_from_core_list_roundtrip():
    psi = random_mps(5, chi_true=3)
    back = psi.to_core_list()
    assert len(back) == 5
    assert back[0].shape == (1, 2, 3)
    assert back[2].shape == (3, 2, 3)
    assert back[-1].shape == (3, 2, 1)


def test_from_core_list_validation():
    with pytest.raises(ValueError):
        MPS.from_core_list([np.zeros((2, 2, 1))])  # bad left edge
    with pytest.raises(ValueError):
        MPS.from_core_list([np.zeros((1, 3, 1))])  # bad site dim
    with pytest.raises(ValueError):
        # mismatched bond wiring
        MPS.from_core_list([np.zeros((1, 2, 3)), np.zeros((2, 2, 1))])


def test_mps_to_vector_orders():
    # encode a known vector; natural order must match the input
    x = np.arange(1.0, 9.0)
    psi = signal_mps(x, cutoff=0.0)
    v = np.asarray(mps_to_vector(psi))
    assert np.allclose(v, x, atol=1e-12)
    vr = np.asarray(mps_to_vector(psi, reverse=True))
    # reverse=True is bit-reversed ordering
    from qilaplace_tpu.utils.bits import bit_reversal_permutation

    perm = bit_reversal_permutation(3)
    assert np.allclose(vr, x[perm], atol=1e-12)


def test_amplitude_stores_norm():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    psi = signal_mps(x)
    assert np.isclose(float(psi.amplitude), np.linalg.norm(x))
    assert np.isclose(float(norm(psi)), 1.0, atol=1e-12)


def test_coefficient_matches_vector():
    x = np.random.default_rng(1).normal(size=16)
    psi = signal_mps(x, cutoff=0.0)
    n = 4
    for j in range(16):
        bits = int_to_bits(j, n)  # MSB-first = natural config
        c = complex(coefficient(psi, jnp.asarray(bits)))
        assert np.isclose(c, x[j], atol=1e-12)
    # getitem sugar
    assert np.isclose(complex(psi[0, 0, 1, 1]), x[3], atol=1e-12)


def test_coefficient_batch_matches_single():
    x = np.random.default_rng(2).normal(size=32)
    psi = signal_mps(x, cutoff=0.0)
    configs = np.array([int_to_bits(j, 5) for j in range(32)])
    got = np.asarray(coefficient_batch(psi, configs))
    assert np.allclose(got, x, atol=1e-12)


def test_norm_random_mps():
    psi = random_mps(6, chi_true=4, seed=3, complex_=True)
    v = np.asarray(mps_to_vector(psi))
    assert np.isclose(float(norm(psi)), np.linalg.norm(v), atol=1e-10)


@pytest.mark.parametrize("direction", ["left", "right"])
def test_canonicalize_preserves_state(direction):
    psi = random_mps(6, chi_true=4, seed=4, complex_=True)
    v0 = np.asarray(mps_to_vector(psi))
    out = canonicalize(psi, direction)
    v1 = np.asarray(mps_to_vector(out))
    assert np.allclose(v0, v1, atol=1e-10)


def test_canonicalize_isometries():
    psi = random_mps(5, chi_true=4, seed=5)
    out = canonicalize(psi, "right")
    cores = out.to_core_list()
    for c in cores[:-1]:
        l, s, r = c.shape
        M = c.reshape(l * s, r)
        G = M.conj().T @ M
        assert np.allclose(G, np.eye(r), atol=1e-10)


def test_compress_preserves_and_truncates():
    # low-rank signal: sum of 2 decaying exponentials has tiny TT ranks
    j = np.arange(2**8)
    x = np.exp(-0.01 * j) + 0.5 * np.exp(-0.03 * j)
    psi = signal_mps(x, cutoff=0.0)  # untruncated encode
    out = compress(psi, maxdim=4, tol=1e-10)
    v = np.asarray(mps_to_vector(out))
    assert np.allclose(v, x, atol=1e-6 * np.linalg.norm(x))
    assert int(jnp.max(out.ranks)) <= 4
    # normalized tensor data
    assert np.isclose(float(norm(out)), 1.0, atol=1e-10)


def test_compress_absorbs_norm_into_amplitude():
    x = np.random.default_rng(6).normal(size=64)
    psi = signal_mps(x, cutoff=0.0)
    out = compress(psi, tol=1e-12)
    assert np.allclose(
        np.asarray(mps_to_vector(out)), x, atol=1e-9 * np.linalg.norm(x)
    )


def test_ztmps_roundtrip_and_coefficient():
    x = np.random.default_rng(7).normal(size=16)
    zt = signal_ztmps(x, cutoff=1e-12)
    assert isinstance(zt, ZTMPS)
    n = 4
    xn = x / np.linalg.norm(x)
    # paired state: <j|<j| psi = x_j (normalized times amplitude)
    for j in range(16):
        cfg = int_to_paired_bits(j, n)
        c = complex(coefficient(zt, jnp.asarray(cfg)))
        assert np.isclose(c, x[j], atol=1e-10)
    # off-diagonal (j on main, j' on copy) vanishes
    from qilaplace_tpu.utils.bits import interleave_bits, int_to_bits

    cfg = interleave_bits(int_to_bits(3, n), int_to_bits(5, n))
    assert abs(complex(coefficient(zt, jnp.asarray(cfg)))) < 1e-10


def test_ztmps_norm_and_vector():
    x = np.random.default_rng(8).normal(size=8)
    zt = signal_ztmps(x, cutoff=1e-12)
    # paired state norm = 1 (amplitude carries the signal norm)
    assert np.isclose(float(norm(zt)), 1.0, atol=1e-10)
    v = np.asarray(mps_to_vector(zt))
    assert v.shape == (64,)
    assert np.isclose(np.linalg.norm(v), np.linalg.norm(x), atol=1e-8)


def test_site_bond_indices():
    x = np.ones(8)
    psi = signal_mps(x)
    zt = signal_ztmps(x)
    m, c = siteindices(psi)
    assert m == [0, 1, 2] and c == []
    m, c = siteindices(zt)
    assert m == [0, 2, 4] and c == [1, 3, 5]
    bm, bc = bondindices(zt)
    assert bm == [1, 3] and bc == [0, 2, 4]


def test_jit_and_vmap_compatibility():
    x = np.random.default_rng(9).normal(size=(4, 16))
    encode = jax.vmap(lambda v: signal_mps(v, cutoff=0.0, chi=8))
    batch = encode(jnp.asarray(x))
    f = jax.jit(lambda m: norm(m))
    # vmapped container: check one row survives jit through tree flattening
    one = jax.tree_util.tree_map(lambda a: a[0], batch)
    assert np.isclose(float(f(one)), 1.0, atol=1e-10)


def test_coefficient_config_spec_types():
    # reference accepts vectors, tuples, bit strings and big-endian ints
    # (src/mps.jl:609-693, test/test_signal_converters.jl:146-201)
    x = np.random.default_rng(10).normal(size=16)
    psi = signal_mps(x, cutoff=0.0)
    assert np.isclose(complex(coefficient(psi, [0, 1, 1, 0])), x[6], atol=1e-12)
    assert np.isclose(complex(coefficient(psi, (0, 1, 1, 0))), x[6], atol=1e-12)
    assert np.isclose(complex(coefficient(psi, "0110")), x[6], atol=1e-12)
    assert np.isclose(complex(coefficient(psi, "[0,1,1,0]")), x[6], atol=1e-12)
    assert np.isclose(complex(coefficient(psi, 6)), x[6], atol=1e-12)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        coefficient(psi, "01a1")
    with _pytest.raises(ValueError):
        coefficient(psi, 16)  # needs 5 bits


def test_nsite_and_validate():
    import warnings
    from qilaplace_tpu import nsite, validate

    x = np.ones(8)
    psi = signal_mps(x)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert nsite(psi) == 3
        assert any(issubclass(v.category, DeprecationWarning) for v in w)
    validate(psi)  # clean padding
    bad = MPS(
        cores=psi.cores.at[1, 7, 0, 7].set(1.0),
        ranks=psi.ranks,
        amplitude=psi.amplitude,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate(bad)


def test_validate_mpo_and_paired():
    # MPO analog of reference check_singlesitempo/check_pairedsitempo
    # (src/mpo.jl:150-372)
    import pytest as _pytest
    import jax.numpy as jnp
    from qilaplace_tpu import build_zt_mpo, identity_mpo, validate
    from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO

    W = identity_mpo(3, chi=4)
    validate(W)
    Wp = build_zt_mpo(2, 1.0, cutoff=1e-14)
    validate(Wp, atol=1e-12)

    bad = MPO(cores=W.cores.at[1, 3, 0, 0, 3].set(1.0), ranks=W.ranks)
    with _pytest.raises(ValueError, match="padding"):
        validate(bad)
    with _pytest.raises(ValueError, match="boundary"):
        validate(MPO(cores=W.cores, ranks=W.ranks.at[0].set(2)))
    with _pytest.raises(ValueError, match="even"):
        validate(PairedSiteMPO(chain=W))  # 3 chain sites is not paired


def test_signal_ztmps_full_rank_oracle_n7():
    # regression (advisor, round 1): the copy-tensor fan-out split's true
    # rank is up to 2x the incoming bond rank; with a full-rank signal whose
    # rank saturates its chi bucket the intra-pair bond must NOT be capped
    # at the signal bucket (that silently discarded O(1) Schmidt weight).
    n = 7
    x = np.random.default_rng(7).normal(size=2**n)
    psi = signal_ztmps(x, cutoff=1e-14)
    # diagonal coefficients reproduce the signal exactly
    vals = np.array(
        [complex(coefficient(psi, int_to_paired_bits(j, n))) for j in
         range(0, 2**n, 5)]
    )
    assert np.allclose(vals, x[::5], atol=1e-10)
    # no weight lost anywhere: the chain's total norm equals ||x||
    total = float(norm(psi.chain)) * float(psi.amplitude)
    assert np.isclose(total, np.linalg.norm(x), atol=1e-10)


def test_signal_mps_chi_below_natural_rank():
    # regression (advisor, round 1): a user chi below the natural TT rank
    # must truncate at chi, not crash with a negative-pad error.
    x = np.random.default_rng(3).normal(size=2**12)
    psi = signal_mps(x, chi=16)
    assert psi.chi == 16
    assert int(jnp.max(psi.ranks)) <= 16
    v = np.asarray(mps_to_vector(psi))
    # lossy but sane: captures the bulk of the energy
    assert np.linalg.norm(v - x) < np.linalg.norm(x)


def test_empty_constructors():
    # reference src/mps.jl:142-146 (SignalMPS(n)) and :180-184 (ZTMPS(n)):
    # bare allocation constructors — zero tensors, every bond rank 1.
    from qilaplace_tpu import MPS, ZTMPS, validate

    psi = MPS.empty(5)
    validate(psi)
    assert psi.n == 5 and int(jnp.max(psi.ranks)) == 1
    assert float(jnp.max(jnp.abs(psi.cores))) == 0.0

    zt = ZTMPS.empty(4, chi=4, dtype=jnp.complex128)
    validate(zt)
    assert zt.n == 4 and zt.chain.n == 8
    assert int(jnp.max(zt.chain.ranks)) == 1
    assert float(jnp.max(jnp.abs(zt.chain.cores))) == 0.0
