"""Coverage for smaller API surfaces: partial canonicalization centers,
multi-sweep compression, re-padding, identity constructors, pipelines."""

import numpy as np
import jax.numpy as jnp

from qilaplace_tpu import (
    canonicalize,
    compress,
    identity_mpo,
    mpo_to_dense,
    mps_to_vector,
    signal_mps,
)
from qilaplace_tpu.core.mps import repad
from qilaplace_tpu.core.mpo import mpo_repad, max_bond
from qilaplace_tpu.models import QFTPipeline, ZTPipeline


def test_canonicalize_partial_center():
    x = np.random.default_rng(0).normal(size=64)
    psi = signal_mps(x, cutoff=0.0)
    out = canonicalize(psi, "right", center=3)
    assert np.allclose(np.asarray(mps_to_vector(out)), x, atol=1e-10)
    cores = out.to_core_list()
    for c in cores[:3]:  # sites 0..2 left-orthogonal
        l, s, r = c.shape
        M = c.reshape(l * s, r)
        assert np.allclose(M.conj().T @ M, np.eye(r), atol=1e-10)
    out2 = canonicalize(psi, "left", center=2)
    assert np.allclose(np.asarray(mps_to_vector(out2)), x, atol=1e-10)


def test_compress_multiple_sweeps():
    j = np.arange(128)
    x = np.exp(-0.02 * j) * np.cos(0.4 * j)
    psi = signal_mps(x, cutoff=0.0)
    out = compress(psi, maxdim=6, tol=1e-9, sweeps=3)
    assert np.allclose(
        np.asarray(mps_to_vector(out)), x, atol=1e-5 * np.linalg.norm(x)
    )


def test_repad_roundtrip():
    x = np.random.default_rng(1).normal(size=32)
    psi = signal_mps(x, cutoff=0.0)  # chi pad 8
    up = repad(psi, 32)
    assert up.chi == 32
    assert np.allclose(np.asarray(mps_to_vector(up)), x, atol=1e-12)
    down = repad(up, 8)
    assert down.chi == 8
    assert np.allclose(np.asarray(mps_to_vector(down)), x, atol=1e-12)


def test_identity_constructors():
    W = identity_mpo(3, chi=4, dtype=jnp.complex128)
    assert np.allclose(np.asarray(mpo_to_dense(W)), np.eye(8), atol=1e-14)
    Wp = identity_mpo(2, chi=4, dtype=jnp.complex128, paired=True)
    assert np.allclose(np.asarray(mpo_to_dense(Wp.chain)), np.eye(16), atol=1e-14)
    assert int(max_bond(mpo_repad(W, 8))) == 1


def test_qft_pipeline_end_to_end():
    n = 6
    pipe = QFTPipeline(n, chi=16, cutoff=1e-10, dtype=jnp.complex128)
    j = np.arange(2**n)
    x = np.sin(2 * np.pi * 5 * j / 2**n)
    spec = np.asarray(pipe(x, np.arange(2**n)))
    fft = np.fft.fft(x) / np.sqrt(2**n)
    assert np.allclose(spec, fft, atol=1e-5)


def test_zt_pipeline_mpo_cache():
    pipe = ZTPipeline(4, chi=32, dtype=jnp.complex128)
    W1 = pipe.mpo(1.0)
    W2 = pipe.mpo(1.0)
    assert W1 is W2  # cached per wr
    out = pipe.forward(pipe.encode(np.random.default_rng(2).normal(size=16),
                                   method="svd"), 1.0)
    grid = np.asarray(pipe.chi_grid(out, np.arange(4), np.arange(4)))
    assert grid.shape == (4, 4)
