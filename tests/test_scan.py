"""Pole-identification workflow tests (mirrors the flagship tutorial,
reference docs/src/tutorials/zt.jl:296-411, at test-friendly scale)."""

import numpy as np
import jax.numpy as jnp

from qilaplace_tpu import (
    apply,
    build_zt_mpo,
    signal_ztmps,
    chi_grid,
    z_from_kl,
    kl_from_z,
    pole_scan,
    coarse_to_fine_pole_search,
)

from helpers import analytical_zt


def test_z_kl_roundtrip():
    n, wr = 8, 0.5
    for k, l in [(3, 7), (100, 200), (0, 0)]:
        z = z_from_kl(k, l, n, wr)
        k2, l2 = kl_from_z(z, n, wr)
        assert int(k2) == k and int(l2) == l


def test_chi_grid_vectors():
    n, wr = 3, 1.0
    x = np.random.default_rng(0).normal(size=8)
    W = build_zt_mpo(n, wr, cutoff=1e-14)
    out = apply(W, signal_ztmps(x, cutoff=1e-14))
    ks = np.array([0, 3, 5])
    ls = np.array([1, 2])
    grid = np.asarray(chi_grid(out, ks, ls))
    Z = analytical_zt(x, wr)
    assert np.allclose(grid, Z[np.ix_(ks, ls)], atol=1e-8)


def test_chi_grid_direct_matches_analytic():
    # direct <config| W |psi> route == analytic zT (no product state formed)
    from qilaplace_tpu.scan.pole_scan import chi_grid_direct

    n, wr = 3, 1.0
    x = np.random.default_rng(0).normal(size=8)
    W = build_zt_mpo(n, wr, cutoff=1e-14)
    psi = signal_ztmps(x, cutoff=1e-14)
    ks = np.array([0, 3, 5])
    ls = np.array([1, 2])
    grid = np.asarray(chi_grid_direct(W, psi, ks, ls))
    Z = analytical_zt(x, wr)
    assert np.allclose(grid, Z[np.ix_(ks, ls)], atol=1e-8)


def test_pole_scan_peak():
    n, wr = 3, 0.75
    x = np.random.default_rng(1).normal(size=8)
    W = build_zt_mpo(n, wr, cutoff=1e-14)
    out = apply(W, signal_ztmps(x, cutoff=1e-14))
    res = pole_scan(out, np.arange(8), np.arange(8), wr=wr)
    Z = analytical_zt(x, wr)
    # real signals give conjugate-symmetric chi -> the max can be exactly
    # tied; require the found peak to attain the max magnitude
    kp, lp = int(res.k_peak), int(res.l_peak)
    assert np.isclose(np.abs(Z[kp, lp]), np.abs(Z).max(), atol=1e-10)
    assert np.isclose(
        complex(res.z_peak), complex(z_from_kl(kp, lp, n, wr)), atol=1e-12
    )


def test_coarse_to_fine_pole_search():
    # Tutorial regime (reference docs/src/tutorials/zt.jl:250-268): a weakly
    # growing oscillation a^j cos(w0 j) whose chi peaks near the poles
    # z = (1/a) e^{-+i w0}, which must sit close to the unit circle for a
    # magnitude scan to localize them (|chi| is radially monotonic away from
    # the circle; the reference tutorial's pole sits at r = 0.99984).
    n = 10
    N = 2**n
    a, w0 = 1.001, 0.7
    j = np.arange(N)
    x = a**j * np.cos(w0 * j)
    psi_z = signal_ztmps(x, cutoff=1e-12, maxdim=64)
    res = coarse_to_fine_pole_search(
        psi_z,
        coarse_points=128,
        fine_points=64,
        superfine_half=8,
        cutoff=1e-12,
        maxdim=64,
    )
    z_poles = [(1 / a) * np.exp(-1j * w0), (1 / a) * np.exp(1j * w0)]
    z_hat = complex(res.z_pole)
    err = min(abs(z_hat - zp) for zp in z_poles)
    # pole radius error bounded by coarse radial resolution; angle much tighter
    assert err < 5e-2, (z_hat, z_poles, err)
    ang_err = min(
        abs(np.angle(z_hat) - np.angle(zp)) for zp in z_poles
    )
    assert ang_err < 2 * np.pi * 16 / N, (z_hat, z_poles, ang_err)


def test_coarse_to_fine_pole_search_direct_readout():
    # readout="direct" (zipper <cfg|W|psi>, no product state) localizes the
    # same pole as the apply route
    n = 8
    N = 2**n
    a, w0 = 1.004, 0.7
    j = np.arange(N)
    x = a**j * np.cos(w0 * j)
    psi_z = signal_ztmps(x, cutoff=1e-12, maxdim=64)
    res = coarse_to_fine_pole_search(
        psi_z,
        coarse_points=64,
        fine_points=32,
        superfine_half=4,
        cutoff=1e-12,
        maxdim=64,
        readout="direct",
    )
    z_poles = [(1 / a) * np.exp(-1j * w0), (1 / a) * np.exp(1j * w0)]
    z_hat = complex(res.z_pole)
    assert min(abs(z_hat - zp) for zp in z_poles) < 5e-2, (z_hat, z_poles)


import os as _os
import time as _time

import pytest as _pytest


def test_public_api_flagship_n14_production_config():
    # Round-3 verdict #1 "done" criterion: the bench-grade fast path
    # (cross encode + analytic build + artifact cache + direct readout)
    # reachable through the PUBLIC API in bench-class time. Production
    # config: f32 signal -> c64 operators, readout auto-resolves "direct".
    from qilaplace_tpu import signal_ztmps, coarse_to_fine_pole_search

    n = 14
    N = 2**n
    lam, w0 = 1.0e-2 / N * 2**4, 4.08e-3 * 2**6
    j = np.arange(N)
    x = (np.exp(-lam * j) * np.sin(w0 * j)).astype(np.float32)
    t0 = _time.perf_counter()
    psi_z = signal_ztmps(x, method="cross", cutoff=1e-10, maxdim=128)
    res = coarse_to_fine_pole_search(
        psi_z,
        coarse_points=64,
        fine_points=64,
        superfine_half=8,
        cutoff=1e-12,
        maxdim=128,
    )
    wall = _time.perf_counter() - t0
    assert np.dtype(psi_z.chain.cores.dtype).itemsize == 4  # f32 in, direct
    z_poles = [np.exp(-lam + 1j * w0), np.exp(-lam - 1j * w0)]
    err = min(abs(complex(res.z_pole) - zp) for zp in z_poles)
    # superfine resolution at wr_fine=0.5 is ~2pi/N in angle
    assert err < 32 * 2 * np.pi / N, (complex(res.z_pole), z_poles, err)
    # bench-class: the whole search (3 transforms + 3 grids) in seconds on
    # ONE CPU core — generous bound so CI boxes never flake
    assert wall < 180, wall


def test_zt_mpo_artifact_cache(tmp_path):
    # zt_mpo(cache=True) persists per-(engine, n, wr, ...) artifacts; the
    # warm load returns the identical operator in ~ms (verdict #1/#2)
    from qilaplace_tpu import zt_mpo

    n, wr = 8, 2 * np.pi
    t0 = _time.perf_counter()
    W1 = zt_mpo(n, wr, cutoff=1e-12, maxdim=128, dtype=np.complex128,
                cache_dir=str(tmp_path))
    t_cold = _time.perf_counter() - t0
    assert len(list(tmp_path.glob("zt_analytic_*.npz"))) == 1
    t0 = _time.perf_counter()
    W2 = zt_mpo(n, wr, cutoff=1e-12, maxdim=128, dtype=np.complex128,
                cache_dir=str(tmp_path))
    t_warm = _time.perf_counter() - t0
    assert np.allclose(np.asarray(W1.chain.cores), np.asarray(W2.chain.cores))
    assert np.array_equal(np.asarray(W1.chain.ranks), np.asarray(W2.chain.ranks))
    assert t_warm < max(0.5, 0.5 * t_cold), (t_cold, t_warm)


@_pytest.mark.skipif(
    not _os.environ.get("QILAPLACE_PARITY_FULL"),
    reason="flagship n=30 public-API run is env-gated (QILAPLACE_PARITY_FULL=1)",
)
def test_public_api_flagship_n30_production_config():
    # The bench headline regime through the PUBLIC API: n=30 callable
    # signal (quantics function encoding — the 8 GiB vector is never
    # materialized), analytic build, direct readout.
    from qilaplace_tpu import signal_ztmps, coarse_to_fine_pole_search

    n = 30
    N = 2**n
    freq, decay = 2.0, 0.5
    dt = 1.0 / (freq * N)
    w, lam = freq * dt, decay * dt

    def f(j):
        j = j.astype(np.float64)
        return np.sin(w * j) * np.exp(-lam * j)

    f.n_bits = n
    psi_z = signal_ztmps(f, method="cross", cutoff=1e-10, maxdim=128)
    res = coarse_to_fine_pole_search(
        psi_z,
        coarse_points=64,
        fine_points=64,
        superfine_half=8,
        cutoff=1e-12,
        maxdim=128,
        readout="direct",
    )
    z_poles = [np.exp(-lam * 1.0 + 1j * w), np.exp(-lam - 1j * w)]
    err = min(abs(complex(res.z_pole) - zp) for zp in z_poles)
    assert err < 64 * 2 * np.pi / N, (complex(res.z_pole), err)


def test_apply_then_read_f64_scan_route():
    # The bench's CPU-fallback scan route ("apply64": range-zip apply once,
    # tighten to the realized rank bucket, batch-read in f64) must match
    # the dense zT oracle within the cutoff's truncation budget — this is
    # what makes an all-host run accurate without the direct zipper.
    from qilaplace_tpu import zt_mpo, tighten
    from qilaplace_tpu.core.mps import coefficient_batch
    from qilaplace_tpu.utils.bits import paired_config_from_kl

    n, wr = 10, 2 * np.pi
    N = 2**n
    lam, w0 = 2.0e-3, 0.35
    j = np.arange(N)
    x = np.exp(-lam * j) * np.sin(w0 * j)
    psi = tighten(signal_ztmps(x, method="cross", cutoff=1e-12, maxdim=128))
    W = tighten(zt_mpo(n, wr, engine="analytic", cutoff=1e-12, maxdim=128,
                       dtype=np.complex128, cache=False))
    out = tighten(apply(W, psi, maxdim=96, cutoff=1e-9, final_sweeps=0,
                        zip_mode="range"))
    rng = np.random.default_rng(3)
    ks = rng.integers(0, N, 512)
    ls = rng.integers(0, N, 512)
    cfg = paired_config_from_kl(jnp.asarray(ks), jnp.asarray(ls), n)
    got = np.asarray(coefficient_batch(out, cfg))
    Z = analytical_zt(x, wr)
    want = Z[ks, ls]
    err = np.abs(got - want).max() / np.abs(Z).max()
    assert err < 1e-5, err


@_pytest.mark.slow
def test_coarse_to_fine_pole_search_n20():
    # flagship n=20 coarse-to-fine search in the DEFAULT gate (verdict #6)
    # Reference-scale flagship run (docs/src/tutorials/zt.jl:250-268,
    # 296-411): n=20, chi=128, damped oscillation with the tutorial's pole
    # z+ ~ 0.99984 + 0.00408i; the coarse (wr=2pi) -> fine (wr=0.5) ->
    # superfine cascade must localize it through the fine-window remap.
    n = 20
    N = 2**n
    lam, w0 = 1.6e-4, 4.08e-3
    j = np.arange(N)
    x = np.exp(-lam * j) * np.sin(w0 * j)
    psi_z = signal_ztmps(x, cutoff=1e-12, maxdim=128)
    res = coarse_to_fine_pole_search(
        psi_z,
        coarse_points=128,
        fine_points=128,
        superfine_half=24,
        cutoff=1e-12,
        maxdim=128,
    )
    z_poles = [np.exp(-lam + 1j * w0), np.exp(-lam - 1j * w0)]
    z_hat = complex(res.z_pole)
    err = min(abs(z_hat - zp) for zp in z_poles)
    # superfine grid resolution at wr_fine = 0.5: dr ~ 0.5/N, dtheta ~ 2pi/N
    res_grid = 8 * 2 * np.pi / N
    assert err < max(5e-4, 4 * res_grid), (z_hat, z_poles, err)
