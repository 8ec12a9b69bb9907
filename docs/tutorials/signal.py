# # Signal encoding tutorial
#
# Counterpart of reference docs/src/tutorials/signal.jl: generate a signal,
# encode it as a quantics MPS, inspect compression, and read amplitudes.
#
# Run: python docs/tutorials/signal.py

import numpy as np
import jax.numpy as jnp

from qilaplace_tpu import (
    generate_signal,
    signal_mps,
    mps_to_vector,
    coefficient,
    compress,
    norm,
)
from qilaplace_tpu.utils.bits import int_to_bits

# ## Generate a decaying sinusoid of 2^10 samples
n = 10
x = np.asarray(generate_signal(n, kind="sin_decay", freq=2.0, decay_rate=0.5,
                               dtype=jnp.float64))
print(f"signal: N={len(x)}, norm={np.linalg.norm(x):.4f}")

# ## Encode: site 1 carries the most-significant index bit
psi = signal_mps(x, cutoff=1e-12)
print(f"MPS: n={psi.n} sites, padded chi={psi.chi}, bond ranks={np.asarray(psi.ranks)}")
print(f"amplitude (original norm): {float(psi.amplitude):.4f}, "
      f"tensor norm: {float(norm(psi)):.6f}")

# ## Round trip and pointwise access
back = np.asarray(mps_to_vector(psi))
print("max reconstruction error:", np.abs(back - x).max())

j = 137
bits = int_to_bits(j, n)  # MSB-first = natural configuration
print(f"x[{j}] = {x[j]:.6f}, coefficient = {float(coefficient(psi, bits).real):.6f}")
print("indexing sugar:", float(psi[tuple(bits)].real))

# ## Compression: low-rank structure of smooth signals
small = compress(psi, maxdim=8, tol=1e-8)
err = np.abs(np.asarray(mps_to_vector(small)) - x).max()
print(f"compressed to maxdim=8: ranks={np.asarray(small.ranks)}, max err={err:.2e}")

# ## Randomized encoder for large signals
psi_r = signal_mps(x, method="rsvd", k=20, p=5, q=2, cutoff=1e-12)
err_r = np.abs(np.asarray(mps_to_vector(psi_r)) - x).max()
print(f"rsvd encode max err: {err_r:.2e}")
