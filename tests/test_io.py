import numpy as np
import jax.numpy as jnp

from qilaplace_tpu import (
    apply,
    build_qft_mpo,
    build_zt_mpo,
    mps_to_vector,
    signal_mps,
    signal_ztmps,
)
from qilaplace_tpu.utils import io


def test_mps_roundtrip(tmp_path):
    x = np.random.default_rng(0).normal(size=32)
    psi = signal_mps(x, cutoff=1e-12)
    p = str(tmp_path / "psi.npz")
    io.save(p, psi)
    back = io.load(p)
    assert np.allclose(np.asarray(mps_to_vector(back)), x, atol=1e-10)
    assert np.array_equal(np.asarray(back.ranks), np.asarray(psi.ranks))


def test_ztmps_and_mpo_roundtrip(tmp_path):
    x = np.random.default_rng(1).normal(size=16)
    zt = signal_ztmps(x, cutoff=1e-12)
    W = build_zt_mpo(4, 1.0, cutoff=1e-12)
    io.save(str(tmp_path / "zt.npz"), zt)
    io.save(str(tmp_path / "W.npz"), W)
    zt2 = io.load(str(tmp_path / "zt.npz"))
    W2 = io.load(str(tmp_path / "W.npz"))
    out1 = np.asarray(mps_to_vector(apply(W, zt)))
    out2 = np.asarray(mps_to_vector(apply(W2, zt2)))
    assert np.allclose(out1, out2, atol=1e-12)


def test_complex_split_storage(tmp_path):
    W = build_qft_mpo(3)
    p = str(tmp_path / "w.npz")
    io.save(p, W)
    raw = dict(np.load(p))
    # complex cores stored as split real/imag (transfer-safe)
    assert "cores.re" in raw and "cores.im" in raw
    W2 = io.load(p)
    assert np.allclose(np.asarray(W2.cores), np.asarray(W.cores))
