# # Signal Encoding and Compression
#
# Counterpart of reference docs/src/tutorials/signal.jl (275 lines of
# Literate.jl): how classical signals map onto Matrix Product States, how
# to read the compressed data back, why structured signals compress, and
# where the bit-order pitfalls live.
#
# We write `n` for the number of sites (qubits), so the signal length is
# `N = 2^n`. Run: python docs/tutorials/signal.py
#
# ## 1. The quantics map
#
# A length-2^n signal x is reshaped into an n-dimensional (2, 2, ..., 2)
# tensor: sample index j = (b1 b2 ... bn)_2 in binary, with **site 1
# carrying the MOST significant bit** (the coarsest scale of the signal;
# reference src/signals/SignalConverters.jl:39-41). Each site of the MPS
# then holds one binary digit — one spatial SCALE. Smooth signals couple
# scales weakly, so the tensor factorizes into a low-rank chain.

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
    generate_signal,
    signal_mps,
    mps_to_vector,
    coefficient,
    compress,
    norm,
    validate,
)
from qilaplace_tpu.core.mps import coefficient_batch
from qilaplace_tpu.utils.bits import int_to_bits

n = 10
N = 2**n

# A two-tone sinusoid with per-tone phases (vector freq/phase, reference
# Signals.jl:46-62):
x = np.asarray(
    generate_signal(
        n, kind="sin", dt=1 / N, freq=[2 * np.pi, 6 * np.pi],
        phase=[0.2, -0.4], dtype=jnp.float64,
    )
)
print(f"signal: N={len(x)}, norm={np.linalg.norm(x):.4f}")

# ## 2. Encoding, and where the norm goes
#
# `signal_mps` stores the NORMALIZED signal in the tensor chain and keeps
# the original 2-norm in `.amplitude` (reference src/mps.jl:66,74):
# every coefficient read multiplies the amplitude back in, so the MPS
# behaves like the original, un-normalized array.

psi = signal_mps(x, cutoff=1e-12)
print(f"MPS: n={psi.n} sites, padded chi={psi.chi}, "
      f"bond ranks={np.asarray(psi.ranks)}")
print(f"amplitude={float(psi.amplitude):.4f}  tensor norm="
      f"{float(norm(psi)):.6f} (unit by construction)")
validate(psi)  # structural invariants: boundary ranks, zero padding

# Two tones -> rank ~4-5 chain: each extra frequency adds O(1) rank,
# independent of N. That is the whole point of the quantics encoding.

# ## 3. Reading elements: three equivalent access forms
#
# (reference tutorial section 2; coefficient spec parsing at
# src/mps.jl:609-685)

j = 137
bits = int_to_bits(j, n)  # MSB-first, matching the encode convention
print(f"x[{j}]              = {x[j]: .8f}")
print(f"integer access      = {float(coefficient(psi, j).real): .8f}")
print(f"bit-array access    = {float(coefficient(psi, bits).real): .8f}")
print(f"direct indexing     = {float(psi[tuple(bits)].real): .8f}")

# The batched form evaluates many configurations as ONE device program —
# the TPU-native replacement for coefficient loops:
sel = np.arange(0, N, N // 8)
cfgs = np.array([int_to_bits(int(t), n) for t in sel])
vals = np.asarray(coefficient_batch(psi, cfgs)).real
print("batched reads match:", np.allclose(vals, x[sel], atol=1e-10))

# ### Bit-order pitfall
#
# MSB-first is the ENCODE convention; transform outputs come out
# bit-REVERSED (LSB-first). Mixing the two silently reads the value at the
# bit-reversed index:
j_rev = int("".join(map(str, bits[::-1])), 2)
wrong = float(coefficient(psi, bits[::-1]).real)
print(f"reversed bits read x[{j_rev}] = {wrong:.8f} (NOT x[{j}])")

# ## 4. Round trip and truncation error
#
# `mps_to_vector` contracts the chain back to a dense vector (small n
# only). The encode cutoff bounds the RELATIVE SQUARED weight discarded
# per split (ITensors' rule), so amplitude errors scale like sqrt(cutoff).

back = np.asarray(mps_to_vector(psi))
print("max reconstruction error:", np.abs(back - x).max())

for maxdim in (8, 4, 2):
    small = compress(psi, maxdim=maxdim, tol=1e-10)
    err = np.abs(np.asarray(mps_to_vector(small)) - x).max()
    print(f"compress to maxdim={maxdim}: ranks={np.asarray(small.ranks)}"
          f" max err={err:.2e}")

# Rank 2 can no longer hold two tones — the error jumps. Compression is
# graceful: the best rank-k approximation at each bond (canonical-form
# truncation, reference src/mps.jl:913-998).

# ## 5. Structured vs random signals
#
# Random signals have NO scale structure: ranks grow as 2^(n/2) and
# nothing compresses. Compare the middle-bond rank:

x_rand = np.asarray(generate_signal(n, kind="random", dtype=jnp.float64))
psi_rand = signal_mps(x_rand, cutoff=1e-12)
mid = psi.n // 2
print(f"middle bond rank: structured={int(np.asarray(psi.ranks)[mid])} "
      f"random={int(np.asarray(psi_rand.ranks)[mid])} (cap 2^(n/2)={2**(n//2)})")

# ## 6. The randomized encoder
#
# method='rsvd' replaces each dense split with a randomized range-finder —
# a single big GEMM per split, the MXU-shaped path (reference
# src/linalg/rsvd.jl; ~50x faster than the dense sweep at n=24, see
# docs/benchmarking.md). k/p/q are sketch rank, oversampling, and power
# iterations.

psi_r = signal_mps(x, method="rsvd", k=20, p=5, q=2, cutoff=1e-12)
err_r = np.abs(np.asarray(mps_to_vector(psi_r)) - x).max()
print(f"rsvd encode max err: {err_r:.2e}")

# For signals that do not fit in host memory, generate and encode directly
# on the device: generate_signal builds with jnp, signal_mps runs as one
# jitted program, and nothing but the chi-sized cores ever leaves the
# accelerator.

# ## 7. Choosing between SVD and RSVD
#
# (reference tutorial sections 3-4) The dense TT-SVD sweep computes the
# full singular spectrum at every split — a strict error guarantee, at
# full-spectrum cost, and it will faithfully spend rank on ANYTHING in the
# data, including noise. The randomized encoder captures only the top-k
# directions per split: far cheaper on large signals, and a built-in
# low-pass on unstructured content.
#
# Rule of thumb: SVD for small or clean data where guaranteed accuracy
# matters; RSVD for large or noisy data where the full spectrum is wasted.
# Timings on a decaying three-tone signal:

import time

x_big = np.asarray(
    generate_signal(
        n, kind="sin_decay", dt=1 / N,
        freq=[2 * np.pi * 5, 2 * np.pi * 17, 2 * np.pi * 23],
        decay_rate=[1.25, 1.4, 1.55], phase=[0.0, 0.4, -0.6],
        dtype=jnp.float64,
    )
)


def bench_encode(**kw):
    t0 = time.perf_counter()
    p = signal_mps(x_big, cutoff=1e-9, **kw)
    jax.block_until_ready(p.cores)
    dt = time.perf_counter() - t0
    err = np.linalg.norm(np.asarray(mps_to_vector(p)) - x_big)
    err /= np.linalg.norm(x_big)
    return p, dt, err


psi_svd, t_svd, e_svd = bench_encode(method="svd", maxdim=96)
psi_rsvd, t_rsvd, e_rsvd = bench_encode(method="rsvd", maxdim=96, k=10)
print(f"SVD : {t_svd:.4f}s  max bond {int(np.asarray(psi_svd.ranks).max())}"
      f"  rel l2 err {e_svd:.2e}")
print(f"RSVD: {t_rsvd:.4f}s  max bond {int(np.asarray(psi_rsvd.ranks).max())}"
      f"  rel l2 err {e_rsvd:.2e}")

# ## 8. The noisy-signal experiment
#
# (reference tutorial section 5) Add 10% Gaussian noise. SVD under a pure
# cutoff chases every fluctuation — noise has no scale structure, so it
# looks like entanglement and the bond dimension blows up toward the
# 2^(n/2) cap. RSVD under a hard budget (maxdim=10, k=10) cannot represent
# the noise at all: it keeps the dominant structured directions — the
# tones and decays — and drops the rest. Its error RELATIVE TO THE NOISY
# INPUT is larger, but what it kept is the underlying signal: budgeted
# randomized encoding doubles as a denoiser.

rng = np.random.default_rng(2026)
x_noisy = x_big + 0.1 * x_big.std() * rng.standard_normal(x_big.shape)

psi_svd_n = signal_mps(x_noisy, method="svd", cutoff=1e-9)
psi_rsvd_n = signal_mps(x_noisy, method="rsvd", cutoff=1e-9, maxdim=10, k=10)
rec_svd = np.asarray(mps_to_vector(psi_svd_n))
rec_rsvd = np.asarray(mps_to_vector(psi_rsvd_n))


def rel(a, b):
    return np.linalg.norm(a - b) / np.linalg.norm(b)


print(f"noisy SVD : max bond {int(np.asarray(psi_svd_n.ranks).max())} "
      f"(blow-up), err vs noisy {rel(rec_svd, x_noisy):.3f}")
print(f"noisy RSVD: max bond {int(np.asarray(psi_rsvd_n.ranks).max())} "
      f"(budgeted), err vs noisy {rel(rec_rsvd, x_noisy):.3f}, "
      f"err vs CLEAN {rel(rec_rsvd, x_big):.3f}")

# ## 9. Figures: reconstruction and denoising
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

idx = np.arange(N)
fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4), constrained_layout=True)
ax1.plot(idx, x_big, lw=2, ls="-.", label="original")
ax1.plot(idx, np.asarray(mps_to_vector(psi_svd)), lw=1, label="SVD")
ax1.plot(idx, np.asarray(mps_to_vector(psi_rsvd)), lw=1, label="RSVD")
ax1.set_title("structured signal: both encoders track it")
ax1.set_xlabel("integer index i")
ax1.set_ylabel("signal value")
ax1.legend()
ax2.plot(idx, x_noisy, lw=0.8, color="0.6", label="noisy input")
ax2.plot(idx, rec_svd, lw=1, ls="-.", label="SVD (tracks noise)")
ax2.plot(idx, rec_rsvd, lw=1.8, label="RSVD maxdim=10 (tracks signal)")
ax2.set_title("10% noise: budgeted RSVD denoises")
ax2.set_xlabel("integer index i")
ax2.legend()
fig.savefig(os.path.join(_figdir, "signal_compression.svg"))
print("figure written to docs/assets/tutorials/signal_compression.svg")
