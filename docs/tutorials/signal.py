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

# honor JAX_PLATFORMS even where a sitecustomize pre-pinned a backend
import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)  # tutorials teach in f64

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
