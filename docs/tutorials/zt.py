# # Discrete Laplace (z-)transform and pole identification
#
# Counterpart of reference docs/src/tutorials/zt.jl — the flagship workflow:
# encode a damped oscillation on the paired register, apply the zT MPO, and
# locate its poles in the complex z-plane by coarse-to-fine |chi| scans.
#
#   chi(k, l) = (1/N) sum_j x_j e^{-(wr k + i wi l) j / N}
#   s(k, l)   = (wr k + i wi l)/N,    z(k, l) = e^{-s(k, l)}
#
# Run: python docs/tutorials/zt.py

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
n, N = 2, 4
a, w0 = 0.7, np.pi / 3
x = np.array([a**j * np.cos(w0 * j) for j in range(N)])

psi_z = signal_ztmps(x, cutoff=1e-14)

# sanity: <j|<j| psi = x_j  (interleaved MSB-first j bits on both registers)
jb = int_to_bits(2, n)
amp = complex(coefficient(psi_z, interleave_bits(jb, jb)))
print(f"amplitude check: {amp.real:.6f} vs x[2] = {x[2]:.6f}")

# ## Build and apply the zT operator (wr = wi = 2*pi)
wr = 2 * np.pi
W = build_zt_mpo(n, wr, cutoff=1e-14)
out = apply(W, psi_z)

# ## All 16 coefficients in one vmapped readout; compare to the analytic grid
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

# ## Pole identification at scale: n = 10, poles near the unit circle
n_big = 10
N_big = 2**n_big
a_big = 1.001 * np.exp(1j * 0.002)
w0_big = 0.05
jj = np.arange(N_big)
x_big = (a_big**jj) * np.cos(w0_big * jj)

psi_big = signal_ztmps(
    x_big, method="rsvd", k=50, p=5, q=2, cutoff=1e-12, maxdim=64
)
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
print("error:", min(abs(z_hat - zp) for zp in z_analytic))
