"""Cross-interpolation signal encoders (signals/cross_encode.py; no
reference counterpart — the reference factorizes the materialized vector,
src/signals/SignalConverters.jl:49-196, while the cross route reads
O(n r^2) entries)."""

import numpy as np
import pytest

from qilaplace_tpu import signal_mps, signal_ztmps
from qilaplace_tpu.core.mps import mps_to_vector, validate


def smooth_signal(n):
    jj = np.arange(2**n)
    return np.exp(-0.01 * jj) * np.sin(0.2 * jj) + 0.1 * np.cos(0.003 * jj)


@pytest.mark.parametrize("n", [4, 8, 10])
def test_cross_mps_reconstructs_smooth_signal(n):
    x = smooth_signal(n)
    psi = signal_mps(x, method="cross", cutoff=1e-26)
    validate(psi)
    v = np.asarray(mps_to_vector(psi))
    assert np.abs(v - x).max() <= 1e-10 * np.abs(x).max()
    # quantics rank of a 3-exponential signal is tiny
    assert int(np.asarray(psi.ranks).max()) <= 8


def test_cross_mps_matches_svd_encode():
    x = smooth_signal(8)
    a = np.asarray(mps_to_vector(signal_mps(x, method="cross", cutoff=1e-26)))
    b = np.asarray(mps_to_vector(signal_mps(x, method="svd", cutoff=1e-15)))
    assert np.abs(a - b).max() < 1e-9


def test_cross_ztmps_pairs_and_reconstructs():
    n = 8
    N = 2**n
    x = smooth_signal(n)
    z = signal_ztmps(x, method="cross", cutoff=1e-26)
    validate(z)
    vz = np.asarray(mps_to_vector(z.chain))
    arr = vz.reshape((2,) * (2 * n))
    diag = np.zeros(N)
    for j in range(N):
        b = [(j >> (n - 1 - s)) & 1 for s in range(n)]
        idx = []
        for s in range(n):
            idx.extend([b[s], b[s]])
        diag[j] = arr[tuple(idx)].real
    assert np.abs(diag - x).max() <= 1e-10 * np.abs(x).max()
    # everything off the paired diagonal is exactly zero-weight
    assert abs(np.linalg.norm(vz) ** 2 - np.linalg.norm(diag) ** 2) < 1e-9


def test_cross_encode_callable_no_materialization():
    # n = 34: 2^34 samples could never be materialized in the suite; the
    # callable route reads only the sampled entries
    n = 34

    def sig(idx):
        zz = idx.astype(np.float64) / 2**n
        return np.sin(zz) * np.exp(-0.25 * zz)

    sig.n_bits = n
    psi = signal_mps(sig, method="cross", cutoff=1e-10)
    assert psi.n == n
    assert int(np.asarray(psi.ranks).max()) <= 8
    # amplitude approximates ||x||_2 = sqrt(sum x_j^2); compare against the
    # integral approximation sum ~ 2^n * int_0^1 sin^2(z) e^{-z/2} dz
    from scipy.integrate import quad  # scipy ships with the image

    want = np.sqrt(
        2**n * quad(lambda z: np.sin(z) ** 2 * np.exp(-0.5 * z), 0, 1)[0]
    )
    got = float(np.asarray(psi.amplitude))
    assert abs(got - want) < 1e-3 * want


def test_cross_encode_callable_requires_n_bits():
    with pytest.raises(ValueError):
        signal_mps(lambda idx: idx * 0.0, method="cross")


def test_cross_encode_pads_non_power_of_two():
    x = smooth_signal(6)[:48]
    psi = signal_mps(x, method="cross", cutoff=1e-26)
    v = np.asarray(mps_to_vector(psi))
    assert np.abs(v[:48] - x).max() <= 1e-10
    assert np.abs(v[48:]).max() <= 1e-12
