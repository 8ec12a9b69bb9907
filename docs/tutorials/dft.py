# # Discrete Fourier Transform (QFT) tutorial
#
# Counterpart of reference docs/src/tutorials/dft.jl (317 lines): build the
# QFT MPO, understand its conventions (normalization, sign, bit reversal),
# apply it to an encoded signal, and compare against the dense FFT.
#
# Run: python docs/tutorials/dft.py
#
# ## 1. What operator are we building?
#
# The QFT MPO realizes the unitary DFT with the -2*pi*i sign convention
# and 1/sqrt(N) normalization,
#     F[k, j] = e^{-2 pi i k j / N} / sqrt(N),
# except that its OUTPUT index comes out bit-reversed: the MPO computes
# Q[j, k] = F[bitrev(j), k] (reference test/test_qft_transformer.jl:23-33).
# Bit reversal is intrinsic to the QFT circuit — the controlled-phase
# cascade naturally writes the LEAST significant frequency bit onto the
# first site. Dense FFT implementations hide the same reversal inside
# their butterfly reordering.

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
    build_qft_mpo,
    compress,
    generate_signal,
    mps_to_vector,
    signal_mps,
)
from qilaplace_tpu.core.mps import coefficient_batch
from qilaplace_tpu.core.mpo import max_bond
from qilaplace_tpu.utils.bits import bit_reversal_permutation, int_to_bits

n = 10
N = 2**n
# 8 full cycles across the window -> spectral peak at bin 8
x = np.asarray(
    generate_signal(n, kind="sin", freq=2 * np.pi * 8 / N, dt=1.0,
                    dtype=jnp.float64)
)

# ## 2. Build: the bond dimension plateaus at 8
#
# The builder folds n controlled-phase layers into one compressed MPO
# (reference src/transforms/qft_transformer.jl:121-160). The circuit's
# local ingredients (circuits/qft_gates.py) are the Hadamard and the
# controlled phase,
#
#   H = (1/sqrt 2) [[1, 1], [1, -1]],
#   P_ij = diag(1, e^{-2 pi i / 2^{j-i+1}}),
#
# where P_ij leaves the target alone for control |0> and applies the
# phase for control |1> — wire i gets one H then controlled phases from
# every less significant wire j > i. Despite the DFT being a DENSE N x N
# matrix, the folded MPO's bond dimension saturates at 8 under cutoff
# 1e-14 — the central structural fact that makes log-N Fourier analysis
# possible (reference docs/src/benchmarking.md:211-213).

W = build_qft_mpo(n, cutoff=1e-14)
print(f"QFT MPO: max bond = {int(max_bond(W))} (plateau is 8)")

# ## 3. Apply
#
# Exact application multiplies bond dimensions (chi_W * chi_psi) and never
# truncates (reference apply semantics, src/linalg/apply.jl:75-122); the
# fused form truncates on the fly and is the TPU performance path. For a
# rank-3 signal both agree to the cutoff:

psi = signal_mps(x, cutoff=1e-12)
out_exact = compress(apply(W, psi), tol=1e-10)
out = apply(W, psi, maxdim=32, cutoff=1e-12)
d = np.abs(
    np.asarray(mps_to_vector(out)) - np.asarray(mps_to_vector(out_exact))
).max()
print(f"fused vs exact apply: {d:.2e}")

# ## 4. Reading the spectrum — three equivalent ways

# (a) dense, with reverse=True undoing the bit reversal:
spec = np.asarray(mps_to_vector(out, reverse=True))
fft = np.fft.fft(x) / np.sqrt(N)
print("max |QFT - FFT/sqrt(N)|:", np.abs(spec - fft).max())

# (b) dense with an explicit permutation:
raw = np.asarray(mps_to_vector(out))
perm = bit_reversal_permutation(n)
spec2 = np.zeros_like(raw)
spec2[perm] = raw
print("permutation route agrees:", np.abs(spec2 - spec).max())

# (c) pointwise — the form that scales to n=30, where a dense spectrum
# cannot exist. To read frequency bin k, feed the BIT-REVERSED
# configuration (equivalently: k's bits LSB-first):
bins = np.array([0, 4, 8, 12, 500])
cfgs = np.array([int_to_bits(int(k), n, order="lsb") for k in bins])
vals = np.asarray(coefficient_batch(out, cfgs))
print("pointwise reads match FFT:",
      np.abs(vals - fft[bins]).max())

# ## 5. The dominant frequency
k_peak = int(np.argmax(np.abs(spec[: N // 2])))
print(f"dominant frequency bin: {k_peak} (expect 8)")

# ## 6. Why this beats the FFT at scale
#
# The dense FFT costs O(N log N) and must materialize all N samples. The
# MPS pipeline costs O(n chi^3) for the encode and O(n chi_W^2 chi^2) for
# the apply — LOGARITHMIC in N for structured signals. At n=28 the
# reference measures ~2.7 s for rsvd-encode+apply vs ~8.7 s for the dense
# FFT, and the apply alone is ~0.8 ms (docs/src/benchmarking.md:261-265);
# the committed artifact scripts/benchmark/results/qft_vs_fft.json holds
# this package's own sweep. At n >= 34 the dense array stops fitting in
# memory entirely while the MPS pipeline continues unchanged.

# ## 7. Spectrum analysis of an off-grid two-tone signal
#
# (reference dft.jl:148-293) A richer test: two sinusoids whose
# frequencies are deliberately NOT integer multiples of 2*pi/N, so the
# peaks are broadened and the DC bin is nonzero — both effects
# predictable in closed form. The generator computes
# x_j = sum_r sin(Omega_r j + phi_r) with Omega_r = omega_r * dt.

n_big = 8
N_big = 2**n_big
dt_big = 1 / N_big
freq_big = 2 * np.pi * np.array([8.35, 43.70])
phase_big = np.array([0.0, 0.3])
x_two = np.asarray(
    generate_signal(n_big, kind="sin", dt=dt_big, freq=list(freq_big),
                    phase=list(phase_big), dtype=jnp.float64)
)
psi_two = signal_mps(x_two, cutoff=1e-12)
W8 = build_qft_mpo(n_big, cutoff=1e-12)
spec_two = np.asarray(mps_to_vector(apply(W8, psi_two), reverse=True))
fft_two = np.fft.fft(x_two) / np.sqrt(N_big)
print(f"two-tone spectrum: max |QFT - FFT| = "
      f"{np.abs(spec_two - fft_two).max():.2e}")

# Where should the peaks be? Omega_r = freq_r * dt, symmetric pairs at
# +-Omega_r on the shifted omega in [-pi, pi) axis:
Om = freq_big * dt_big
print("expected peak angular frequencies:", np.round(Om, 3))

# The DC bin has the closed form X(0) = (1/sqrt N) sum_j x_j with
# sum_j sin(Omega j + phi) = sin(N Omega/2) sin(phi + (N-1) Omega/2)
#                            / sin(Omega/2):
dc_pred = sum(
    np.sin(N_big * O / 2) * np.sin(p + (N_big - 1) * O / 2) / np.sin(O / 2)
    for O, p in zip(Om, phase_big)
) / np.sqrt(N_big)
print(f"DC bin: predicted {dc_pred:.6f}, measured {spec_two[0].real:.6f}")

# Shifted-spectrum figure with the error on a second axis:
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

w_axis = (2 * np.pi / N_big) * np.arange(-N_big // 2, N_big // 2)
shift = np.fft.fftshift
fig, ax = plt.subplots(figsize=(8, 4.2), constrained_layout=True)
ax.plot(w_axis, np.abs(shift(spec_two)), lw=2, label="|QFT| (this package)")
ax.plot(w_axis, np.abs(shift(fft_two)), lw=2, ls="--", label="|FFT|/sqrt(N)")
for O in Om:
    ax.axvline(O, color="k", ls="-.", lw=0.8)
    ax.axvline(-O, color="k", ls="-.", lw=0.8)
ax2 = ax.twinx()
ax2.semilogy(w_axis, np.abs(shift(spec_two - fft_two)) + 1e-30, ls=":",
             color="0.5", lw=1)
ax2.set_ylabel("|error|")
ax.set_xlabel("omega")
ax.set_ylabel("magnitude")
ax.set_title("off-grid two-tone spectrum, n = 8")
ax.legend(loc="upper left")
fig.savefig(os.path.join(_figdir, "dft_spectrum.svg"))
print("figure written to docs/assets/tutorials/dft_spectrum.svg")

# ## 8. Outlook: spectral methods in compressed form
#
# Once signals AND operators live as quantics MPS/MPO, a Fourier transform
# is just an MPO-MPS contraction — which opens the classical spectral-
# method toolbox on exponentially fine grids without ever forming dense
# vectors: diffusion semigroups (the Laplacian is diagonal in Fourier
# space), Poisson/Helmholtz solves (derivatives become per-mode algebraic
# factors), split-step Schrodinger-type dynamics (kinetic term in Fourier
# space, potential in real space), convolution-form terms via the
# convolution theorem, and stiff multi-scale problems where quantics
# low-rank structure absorbs the scale separation. The inverse QFT is the
# conjugate-transposed gate cascade — build_qft_mpo's layers with
# conjugated phases — and composes the same way.
