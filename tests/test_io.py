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


def test_ship_state_and_pack_matches_separate():
    # the coalesced 3-dispatch setup transfer must produce EXACTLY what the
    # separate ship(psi) + zt_mpo_from_pack(pack) calls produce
    from qilaplace_tpu import tighten
    from qilaplace_tpu.transforms.analytic import (
        zt_mpo_from_pack,
        zt_product_pack,
    )

    n, wr = 6, 2 * np.pi
    x = np.random.default_rng(2).normal(size=2**n)
    psi = tighten(signal_ztmps(x, cutoff=1e-12))
    pack = zt_product_pack(n, wr, cutoff=1e-12, maxdim=64)

    psi_a = io.ship(psi, None, dtype=jnp.float32)
    W_a = zt_mpo_from_pack(pack, dtype=jnp.complex64)
    psi_b, W_b = io.ship_state_and_pack(psi, pack, None)

    assert psi_b.chain.cores.dtype == psi_a.chain.cores.dtype
    assert np.array_equal(np.asarray(psi_b.chain.cores),
                          np.asarray(psi_a.chain.cores))
    assert np.array_equal(np.asarray(psi_b.chain.ranks),
                          np.asarray(psi_a.chain.ranks))
    assert np.isclose(float(np.real(np.asarray(psi_b.chain.amplitude))),
                      float(np.real(np.asarray(psi_a.chain.amplitude))))
    assert W_b.chain.cores.dtype == W_a.chain.cores.dtype
    assert np.array_equal(np.asarray(W_b.chain.cores),
                          np.asarray(W_a.chain.cores))
    assert np.array_equal(np.asarray(W_b.chain.ranks),
                          np.asarray(W_a.chain.ranks))


def test_ship_state_and_pack_complex_state():
    # complex-state route: both rails of the state cross in the same
    # coalesced buffer and recombine in-program
    from qilaplace_tpu.core.mps import MPS, ZTMPS
    from qilaplace_tpu.transforms.analytic import zt_product_pack

    n, wr = 4, 1.5
    x = np.random.default_rng(3).normal(size=2**n)
    psi = signal_ztmps(x, cutoff=1e-12)
    ch = psi.chain
    cores_c = np.asarray(ch.cores).astype(np.complex128) * (1.0 + 0.5j)
    psi_c = ZTMPS(chain=MPS(cores=jnp.asarray(cores_c), ranks=ch.ranks,
                            amplitude=ch.amplitude))
    pack = zt_product_pack(n, wr, cutoff=1e-12, maxdim=64)
    psi_b, W_b = io.ship_state_and_pack(psi_c, pack,
                                        None, state_dtype=jnp.complex64)
    assert psi_b.chain.cores.dtype == jnp.complex64
    assert np.allclose(np.asarray(psi_b.chain.cores),
                       cores_c.astype(np.complex64))
    assert W_b.chain.cores.dtype == jnp.complex64


def test_complex_split_storage(tmp_path):
    W = build_qft_mpo(3)
    p = str(tmp_path / "w.npz")
    io.save(p, W)
    raw = dict(np.load(p))
    # complex cores stored as split real/imag (transfer-safe)
    assert "cores.re" in raw and "cores.im" in raw
    W2 = io.load(p)
    assert np.allclose(np.asarray(W2.cores), np.asarray(W.cores))
