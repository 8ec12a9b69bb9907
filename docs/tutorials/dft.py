# # Discrete Fourier transform (QFT) tutorial
#
# Counterpart of reference docs/src/tutorials/dft.jl: build the QFT MPO,
# apply it to an encoded signal, and compare against the FFT.
#
# Run: python docs/tutorials/dft.py

import numpy as np
import jax.numpy as jnp

from qilaplace_tpu import (
    apply,
    build_qft_mpo,
    generate_signal,
    mps_to_vector,
    signal_mps,
)
from qilaplace_tpu.core.mpo import max_bond
from qilaplace_tpu.utils.bits import bit_reversal_permutation

n = 10
N = 2**n
# 8 full cycles across the window -> spectral peak at bin 8
x = np.asarray(
    generate_signal(n, kind="sin", freq=2 * np.pi * 8 / N, dt=1.0,
                    dtype=jnp.float64)
)

# ## Build the QFT operator: bond dimension saturates at 8
W = build_qft_mpo(n, cutoff=1e-14)
print(f"QFT MPO: max bond = {int(max_bond(W))} (plateau is 8)")

# ## Encode, transform (fused apply+truncate), read out
psi = signal_mps(x, cutoff=1e-12)
out = apply(W, psi, maxdim=32, cutoff=1e-12)

# The QFT output is bit-reversed: reverse=True reads natural frequency order
spec = np.asarray(mps_to_vector(out, reverse=True))
fft = np.fft.fft(x) / np.sqrt(N)
print("max |QFT - FFT/sqrt(N)|:", np.abs(spec - fft).max())

# Equivalent with an explicit bit-reversal permutation:
raw = np.asarray(mps_to_vector(out))
perm = bit_reversal_permutation(n)
spec2 = np.zeros_like(raw)
spec2[perm] = raw
print("permutation route agrees:", np.abs(spec2 - spec).max())

# ## The dominant frequency
k_peak = int(np.argmax(np.abs(spec[: N // 2])))
print(f"dominant frequency bin: {k_peak} (expect 8)")
