# # Damping transform tutorial
#
# Counterpart of reference docs/src/tutorials/dt.jl: the real-exponential
# half of the Laplace transform on the paired register,
#   DT|j>|j> = (1/sqrt N) sum_k e^{-wr k j / N} |k_rev>|j>.
#
# Run: python docs/tutorials/dt.py

import numpy as np
import jax.numpy as jnp

from qilaplace_tpu import apply, build_dt_mpo, signal_ztmps
from qilaplace_tpu.core.mpo import max_bond
from qilaplace_tpu.models import DTPipeline

n = 8
N = 2**n
wr = 2 * np.pi
j = np.arange(N)
x = np.exp(-0.01 * j) * np.cos(0.3 * j)

# ## Paired-register encode + DT
psi_z = signal_ztmps(x, cutoff=1e-12)
W = build_dt_mpo(n, wr, cutoff=1e-12)
print(f"DT MPO: max bond = {int(max_bond(W))} (plateau ~17-18)")
out = apply(W, psi_z)

# ## Readout through the pipeline API: damped coefficients chi(k) for a
# fixed copy-register index j0
pipe = DTPipeline(n, wr, chi=32, cutoff=1e-10, dtype=jnp.complex128)
out2 = pipe.forward(pipe.encode(x))
ks = np.arange(16)
j0 = np.full(16, 3)
vals = np.asarray(pipe.coefficients(out2, ks, j0))

# analytic: chi(k; j0) = x[j0] e^{-wr k j0 / N} / sqrt(N)
expected = x[3] * np.exp(-wr * ks * 3 / N) / np.sqrt(N)
print("max DT readout error:", np.abs(vals - expected).max())
