import numpy as np

from qilaplace_tpu.utils import bits


def test_int_to_bits_roundtrip():
    for n in [1, 3, 6]:
        for v in range(2**n):
            for order in ("msb", "lsb"):
                b = bits.int_to_bits(v, n, order=order)
                assert bits.bits_to_int(b, order=order) == v


def test_msb_lsb():
    assert bits.int_to_bits(6, 4, order="msb") == [0, 1, 1, 0]
    assert bits.int_to_bits(6, 4, order="lsb") == [0, 1, 1, 0][::-1]


def test_bit_reverse_involution():
    n = 5
    for v in range(2**n):
        assert bits.bit_reverse(bits.bit_reverse(v, n), n) == v
    perm = bits.bit_reversal_permutation(n)
    assert np.array_equal(perm[perm], np.arange(2**n))


def test_interleave():
    assert bits.interleave_bits([1, 0], [0, 1]) == [1, 0, 0, 1]
    assert bits.int_to_paired_bits(2, 2) == [1, 1, 0, 0]


def test_jnp_bits_match_python():
    n = 4
    vals = np.arange(2**n)
    got = np.asarray(bits.jnp_int_to_bits(vals, n, order="lsb"))
    for v in vals:
        assert list(got[v]) == bits.int_to_bits(int(v), n, order="lsb")


def test_paired_config_from_kl():
    n = 3
    cfg = np.asarray(bits.paired_config_from_kl(np.array([5]), np.array([2]), n))[0]
    kb = bits.int_to_bits(5, n, order="lsb")
    lb = bits.int_to_bits(2, n, order="lsb")
    assert list(cfg) == bits.interleave_bits(kb, lb)
