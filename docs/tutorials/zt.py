# # Discrete Laplace (z-)transform and pole identification
#
# Counterpart of reference docs/src/tutorials/zt.jl (444 lines) — the
# flagship workflow: encode a damped oscillation on the paired register,
# apply the zT MPO, and locate its poles in the complex z-plane by
# coarse-to-fine |chi| scans.
#
# ## 0. The coordinate system
#
#   chi(k, l) = (1/N) sum_j x_j e^{-(wr k + i wi l) j / N}
#   s(k, l)   = (wr k + i wi l)/N,    z(k, l) = e^{-s(k, l)}
#
# The (k, l) grid samples the z-plane on N radial shells (k, spacing set
# by wr) x N angles (l, spacing wi/N). With n = 30 that is an
# M = N^2 = 2^60-point grid — never materialized: each chi(k, l) is one
# O(n chi^2) contraction, and a whole scan window is ONE batched device
# program. zT = pairedQFT ∘ DT (DT acts first,
# reference src/transforms/zt_transformer.jl:101-103); its bond dimension
# plateaus near 90 (docs/src/benchmarking.md:216-219).
#
# Readout convention: chi(k, l) lives at the interleaved configuration
# [k_bit0, l_bit0, k_bit1, l_bit1, ...] — both registers LSB-first
# (bit-reversed outputs, reference docs/src/tutorials/zt.jl:152-157).
#
# Run: python docs/tutorials/zt.py

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))  # repo root, for qilaplace_tpu

# Tutorials teach in f64, which TPU backends do not execute natively — pin
# CPU regardless of ambient JAX_PLATFORMS/sitecustomize backend pins
# (QILAPLACE_PLATFORM overrides, same knob as the benchmark runners).
import jax

jax.config.update("jax_platforms", os.environ.get("QILAPLACE_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from qilaplace_tpu import (
    apply,
    build_zt_mpo,
    chi_grid,
    coefficient,
    coarse_to_fine_pole_search,
    signal_ztmps,
    z_from_kl,
)
from qilaplace_tpu.utils.bits import int_to_bits, interleave_bits

# ## Small pedagogical case: n = 2 (N = 4 samples, paired grid M = 16)
#
# The walkthrough signal is a damped cosine
#
#   x_j = a^j cos(w0 j),  j = 0..N-1,  a = 0.7, w0 = pi/3.
#
n, N = 2, 4
a, w0 = 0.7, np.pi / 3
x = np.array([a**j * np.cos(w0 * j) for j in range(N)])
print("x =", np.round(x, 4))

# ## Constructing the ZTMPS
#
# The encoded paired state is
#
#   |x>_pair = sum_j xhat_j |j>_main |j>_copy,    xhat = x / ||x||_2.
#
# Two registers, interleaved site-by-site on one 2n-site chain:
# - MAIN will carry the transform-output index (k, l bits after the zT),
# - COPY carries the original sample index, which the controlled
#   non-unitary damping gates of the zT construction act on.
#
# (The reference materializes the pair as two ITensor site sets; here the
# interleaved 2n chain IS the storage — core/mps.py ZTMPS.)
psi_z = signal_ztmps(x, cutoff=1e-14)

# Element access sanity check: the coefficient at |j>_main |j>_copy must be
# the normalized sample xhat_j. Configuration addressing is MSB-first per
# register; interleave_bits merges (main, copy) into chain order.
jb = int_to_bits(2, n)
amp = complex(coefficient(psi_z, interleave_bits(jb, jb)))
print(f"amplitude check: {amp.real:.6f} vs x[2] = {x[2]:.6f}")

# ## The zT circuit
#
# The sampled transform coefficients are
#
#   chi(k, l) = (1/2^n) sum_j x_j e^{-(wr k / 2^n) j} e^{-i (wi l / 2^n) j}
#   s(k, l)   = (wr k + i wi l) / 2^n,     z(k, l) = e^{-s(k, l)}.
#
# The imaginary part of s sweeps the angle 0..2*pi (for wi = 2*pi) — the
# angular scan; the real part sweeps the radius from 1 down to e^{-wr} —
# the radial scan. Points ON the unit circle (k = 0) are pure
# oscillations; points inside (k > 0) are damped modes. Sampling at the
# origin would need wr -> infinity (infinitely damped).
#
# The operator factors as W_zt = W_qft_paired ∘ W_dt: the DT block
# contributes the damping e^{-wr k j / 2^n} (controlled non-unitary), the
# paired QFT contributes the phase e^{-i 2 pi l j / 2^n}. Its gate
# primitives, in the quantics representation of j, k, l
# (circuits/dt_gates.py, circuits/zt_gates.py):
#
#   H_d = (1/sqrt 2) [[1, 1], [1, e^{-wr/2}]]        damping Hadamard
#   H   = (1/sqrt 2) [[1, 1], [1, -1]]               Hadamard
#   R_lm = diag(1, e^{-wr / 2^{m-l+1}})              controlled damping
#   P_lm = diag(1, e^{-2 pi i / 2^{m-l+1}})          controlled phase
#
# Controlled versions leave the target untouched when the control is |0>
# and apply the damping/phase factor when it is |1>.
#
# Sign convention: the -i phase convention is used in the zT/QFT blocks,
# so z(k, l) = r_k e^{-i theta_l} and Im z(k, l) = -r_k sin(theta_l).

# ## Build and apply the zT operator (wr = wi = 2*pi)
wr = 2 * np.pi
W = build_zt_mpo(n, wr, cutoff=1e-14)
out = apply(W, psi_z)

# ## All 16 coefficients in one vmapped readout; compare to the analytic grid
#
# chi(k, l) lives at the interleaved LSB-first (k, l) configuration
# (transform outputs are bit-reversed); chi_grid does the addressing.
grid = np.asarray(chi_grid(out, np.arange(N), np.arange(N)))
j = np.arange(N)
ref = np.array(
    [
        [np.sum(x * np.exp(-((wr * k + 2j * np.pi * l) / N) * j)) / N
         for l in range(N)]
        for k in range(N)
    ]
)
print("max |chi - analytic|:", np.abs(grid - ref).max())

# Full per-point comparison table (reference zt.jl:197-208):
print(f"  {'(k,l)':<8}  {'chi_num':<22}  {'chi_exact':<22}  {'rel err':>9}")
print("-" * 70)
for k in range(N):
    for l in range(N):
        g, r_ = grid[k, l], ref[k, l]
        rel = abs(g - r_) / max(abs(r_), np.finfo(np.float64).eps)
        print(f"  ({k},{l})     {g.real:+.5f}{g.imag:+.5f}i   "
              f"{r_.real:+.5f}{r_.imag:+.5f}i   {rel:9.2e}")

# The z-plane addresses of the same grid (z = e^{-s}):
zs_small = np.array(
    [[complex(z_from_kl(k, l, n, wr)) for l in range(N)] for k in range(N)]
)
print("z grid =\n", np.round(zs_small, 4))

# ## The three-stage search
#
# A pole of the signal's z-transform is a peak of |chi| on the grid.
# The cascade (reference docs/src/tutorials/zt.jl:296-411):
#
# 1. COARSE — wr = 2 pi spans the whole disk; scan a strided (k, l)
#    lattice and take the argmax.
# 2. FINE — rebuild the MPO at wr = 0.5: the same N radial shells now
#    concentrate near |z| = 1 where physical poles live. The coarse peak
#    (found in wr = 2 pi coordinates) is REMAPPED into the new grid via
#    k' = round(-N ln r / wr_fine), l' = round(N theta / wi) — the
#    z-plane position is the invariant, not the indices
#    (scan/pole_scan.py kl_from_z). Scan a window around the remap.
# 3. SUPERFINE — stride-1 window around the fine peak, reusing the fine
#    transform. Final resolution: dr ~ wr_fine/N radially, 2 pi / N in
#    angle.
#
# Because wr is a traced argument, the fine rebuild reuses the compiled
# build program; on TPU both scans run through the fused Pallas readout.

# ## Pole identification at scale: n = 10, poles near the unit circle
#
# The small grid above is too pixelated to resolve pole structure. Pole
# identification is the flagship application: given a black-box system
# response (generally non-unitary — the signal decays), the pole locations
# in the z-plane characterize the system, the bread and butter of system
# identification and control engineering.
#
# The test signal is a COMPLEX damped oscillation with two poles,
#
#   x_j = a^j cos(w0 j),   a = |a| e^{i phi},
#
# where the complex amplitude deliberately breaks the +/- w0 symmetry the
# real cosine would have about the real axis. The continuum-limit pole
# targets are
#
#   z_+- = (1/a) e^{+-i w0}.
#
# (The reference runs this at n = 20; the executable tutorial keeps n = 10
# so CI stays fast — tests/test_scan.py covers n = 20 under
# QILAPLACE_PARITY_FULL=1, and bench.py exercises n = 30 on the TPU.)
n_big = 10
N_big = 2**n_big
a_big = 1.001 * np.exp(1j * 0.002)
w0_big = 0.05
jj = np.arange(N_big)
x_big = (a_big**jj) * np.cos(w0_big * jj)

psi_big = signal_ztmps(
    x_big, method="rsvd", k=50, p=5, q=2, cutoff=1e-12, maxdim=64
)

# What should the transform look like? The finite-sample closed form is a
# geometric sum per pole: with gamma_+- = a e^{+-i w0} and z the scan point,
#
#   chi(z) = (1/2N) [ (1 - (gamma_+ z)^N) / (1 - gamma_+ z)
#                   + (1 - (gamma_- z)^N) / (1 - gamma_- z) ].
#
# Note this FINITE series has no actual pole — the divergence only
# develops in the N -> infinity limit. A finite, sampled transform shows a
# sharp |chi| ridge near the analytic z_+- instead, which is exactly what
# peak-finding locates.


def chi_finite_reference(z, gamma_p, gamma_m, Nloc):
    s1 = (1 - (gamma_p * z) ** Nloc) / (1 - gamma_p * z)
    s2 = (1 - (gamma_m * z) ** Nloc) / (1 - gamma_m * z)
    return 0.5 / Nloc * (s1 + s2)


# The three-stage cascade. Stage grids: coarse samples 128 x 128 strided
# points of the full disk at wr = 2*pi; fine rebuilds the MPO at a smaller
# wr so the same 2^n radial shells concentrate near |z| = 1 (where the
# physical poles of a near-marginal signal live) and scans a window around
# the remapped coarse peak; superfine scans stride-1 around the fine peak.
res = coarse_to_fine_pole_search(
    psi_big, coarse_points=128, fine_points=64, superfine_half=12,
    cutoff=1e-12, maxdim=64,
)
z_analytic = (1 / a_big) * np.exp(-1j * w0_big), (1 / a_big) * np.exp(1j * w0_big)
z_hat = complex(res.z_pole)
print(f"coarse peak    z = {complex(res.coarse.z_peak):.6f}")
print(f"fine peak      z = {complex(res.fine.z_peak):.6f}")
print(f"superfine peak z = {z_hat:.6f}")
print(f"analytic poles   = {z_analytic[0]:.6f}, {z_analytic[1]:.6f}")
err_pole = min(abs(z_hat - zp) for zp in z_analytic)
print("error:", err_pole)

# Cross-check the scanned peak value against the finite-series closed form
# at the same z (they agree to the truncation budget — the ridge is real,
# not a numerical artifact):
gamma_p = a_big * np.exp(1j * w0_big)
gamma_m = a_big * np.exp(-1j * w0_big)
chi_peak_ref = chi_finite_reference(z_hat, gamma_p, gamma_m, N_big)
chi_peak_got = complex(
    np.asarray(res.superfine.chi)[
        tuple(np.unravel_index(
            np.abs(np.asarray(res.superfine.chi)).argmax(),
            np.asarray(res.superfine.chi).shape,
        ))
    ]
)  # chi values include the signal amplitude (coefficient_batch)
print(f"|chi| at peak: scanned {abs(chi_peak_got):.6e} "
      f"vs closed form {abs(chi_peak_ref):.6e}")

# Why the detected peak is NOT exactly on z_+-: the transform is a finite,
# discretized z-transform of a sampled signal, while the analytic pole
# formula describes the ideal infinite series. The method captures the pole
# signature correctly; finite sampling and grid resolution leave a small,
# resolution-limited offset (here ~|z|/N-scale) that shrinks as the signal
# gets longer and the grid finer — increase n and tighten the superfine
# window to drive it down.

# ## Pole-scan figures
#
# The reference tutorial's flagship artifact is the z-plane scatter of
# |chi| for the three scan stages (docs/src/tutorials/zt.jl:323-340).
# Each point of a ScanResult grid maps to z = r * exp(i*theta) with
# r = exp(-wr*k/N), theta = 2*pi*l/N; color = log10 |chi|.
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

_here = (
    os.path.dirname(os.path.abspath(__file__))
    if "__file__" in globals()
    else os.path.join(os.getcwd(), "docs", "tutorials")
)
_figdir = os.path.join(_here, "..", "assets", "tutorials")
os.makedirs(_figdir, exist_ok=True)

fig, axes = plt.subplots(1, 3, figsize=(13.5, 4.2), constrained_layout=True)
for ax, (stage, label) in zip(
    axes,
    [(res.coarse, "coarse (wr = 2pi)"), (res.fine, "fine (wr = 0.5)"),
     (res.superfine, "superfine (stride 1)")],
):
    ks_g = np.asarray(stage.ks, dtype=np.float64)
    ls_g = np.asarray(stage.ls, dtype=np.float64)
    r = np.exp(-stage.wr * ks_g / N_big)[:, None]
    th = (stage.wi * ls_g / N_big)[None, :]
    zr = (r * np.cos(th)).ravel()
    zi = (r * np.sin(th)).ravel()
    mag = np.log10(np.abs(np.asarray(stage.chi)).ravel() + 1e-30)
    sc = ax.scatter(zr, zi, c=mag, s=4, cmap="viridis")
    zp = complex(stage.z_peak)
    ax.plot(zp.real, zp.imag, "r+", ms=12, mew=2, label="peak")
    for z_an in z_analytic:
        ax.plot(z_an.real, z_an.imag, "wx", ms=8, mew=1.5)
    ax.set_title(label)
    ax.set_xlabel("Re z")
    ax.set_aspect("equal")
    fig.colorbar(sc, ax=ax, label="log10 |chi|", shrink=0.85)
axes[0].set_ylabel("Im z")
fig.suptitle("zT pole scan: coarse -> fine -> superfine (n = 10)")
fig.savefig(os.path.join(_figdir, "zt_pole_scan.svg"))
print("figure written to docs/assets/tutorials/zt_pole_scan.svg")

# ## The production fast path
#
# Everything above used the reference-parity route (rsvd encode, gate-fold
# build). Production workloads use three upgrades, all DEFAULT in
# `coarse_to_fine_pole_search` / `ZTPipeline`:
#
# 1. `method="cross"`: TT cross-interpolation reads O(n r^2) ENTRIES of
#    the signal — pass a CALLABLE with an `n_bits` attribute and the 2^n
#    vector is never materialized (quantics function encoding);
# 2. `engine="analytic"`: the zT operator is evaluated from its
#    closed-form kernel (rail crosses + exact Schmidt-product compression)
#    in well under a second at n=30, and cached as a per-(n, wr, cutoff)
#    artifact so repeat searches skip the build entirely;
# 3. `readout="direct"` (auto on 32-bit states): coefficients contract
#    <config| W |psi> directly, keeping f32 roundoff relative to the path
#    product instead of the state norm.
from qilaplace_tpu import signal_ztmps as _enc

lam_p, w0_p = 2e-4, 0.31


def sig(idx):
    idx = idx.astype(np.float64)
    return np.exp(-lam_p * idx) * np.sin(w0_p * idx)


sig.n_bits = 14  # 2^14 samples, read on demand
psi_prod = _enc(sig, method="cross", cutoff=1e-10, maxdim=128)
res_prod = coarse_to_fine_pole_search(
    psi_prod, coarse_points=64, fine_points=64, superfine_half=8,
    cutoff=1e-12, maxdim=128,
)
z_true = np.exp(-lam_p + 1j * w0_p)
z_got = complex(res_prod.z_pole)
err_prod = min(abs(z_got - z_true), abs(z_got - np.conj(z_true)))
print(f"production path: pole {z_got:.6f} vs analytic {z_true:.6f} "
      f"(err {err_prod:.2e})")
assert err_prod < 0.05
