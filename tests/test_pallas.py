"""Pallas readout kernel vs the lax.scan reference (interpret mode on CPU;
the same kernel compiles for the MXU on TPU)."""

import numpy as np
import jax.numpy as jnp

from qilaplace_tpu import signal_mps, signal_ztmps, coefficient_batch
from qilaplace_tpu.ops.pallas_kernels import coefficient_batch_pallas
from qilaplace_tpu.utils.bits import int_to_bits, paired_config_from_kl


def test_pallas_coefficient_matches_scan():
    n = 5
    x = np.random.default_rng(0).normal(size=2**n).astype(np.float32)
    psi = signal_mps(jnp.asarray(x), cutoff=1e-7, chi=8)
    configs = np.array([int_to_bits(j, n) for j in range(2**n)])
    ref = np.asarray(coefficient_batch(psi, configs))
    got = np.asarray(coefficient_batch_pallas(psi, configs, interpret=True))
    assert np.allclose(got, ref, atol=1e-5)
    assert np.allclose(got.real, x, atol=1e-5)


def test_pallas_coefficient_ztmps_complex():
    n = 3
    rng = np.random.default_rng(1)
    x = rng.normal(size=2**n).astype(np.float32)
    zt = signal_ztmps(jnp.asarray(x), cutoff=1e-7, chi=8)
    # complex chain: multiply cores by a phase through apply-free route —
    # just check paired readout configs against the scan version
    ks = jnp.asarray(rng.integers(0, 2**n, size=300))
    ls = jnp.asarray(rng.integers(0, 2**n, size=300))
    cfg = paired_config_from_kl(ks, ls, n)
    ref = np.asarray(coefficient_batch(zt, cfg))
    got = np.asarray(coefficient_batch_pallas(zt, cfg, interpret=True))
    assert np.allclose(got, ref, atol=1e-5)


def test_pallas_padding_safe():
    # batch size not a multiple of the tile
    n = 4
    x = np.random.default_rng(2).normal(size=2**n).astype(np.float32)
    psi = signal_mps(jnp.asarray(x), cutoff=1e-7, chi=8)
    configs = np.array([int_to_bits(j, n) for j in range(5)])
    got = np.asarray(coefficient_batch_pallas(psi, configs, interpret=True))
    assert got.shape == (5,)
    assert np.allclose(got.real, x[:5], atol=1e-5)
