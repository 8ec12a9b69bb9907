# # Damping Transform (DT) tutorial
#
# Counterpart of reference docs/src/tutorials/dt.jl (405 lines): the
# real-exponential half of the Laplace transform,
#     DT |j>|j> = (1/sqrt N) sum_k e^{-wr k j / N} |k_rev>|j>,
# acting on the PAIRED register. Run: python docs/tutorials/dt.py
#
# ## 1. Why a paired register?
#
# A damping e^{-wr k j / N} couples the OUTPUT index k to the INPUT index
# j — unlike the DFT, the input must survive into the output. The paired
# register |j>|j> (main + copy rails, interleaved site layout
# [main_1, copy_1, main_2, copy_2, ...]) keeps a copy of j: the transform
# writes k onto the main rail and leaves j on the copy rail. signal_ztmps
# prepares sum_j x_j |j>|j> by fanning each physical leg out through a
# copy tensor (reference src/signals/SignalConverters.jl:247-283).

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
    apply,
    build_dt_mpo,
    coefficient,
    signal_ztmps,
    validate,
)
from qilaplace_tpu.core.mpo import max_bond
from qilaplace_tpu.models import DTPipeline
from qilaplace_tpu.utils.bits import int_to_bits, interleave_bits

n = 8
N = 2**n
wr = 2 * np.pi
j = np.arange(N)
x = np.exp(-0.01 * j) * np.cos(0.3 * j)

psi_z = signal_ztmps(x, cutoff=1e-12)
validate(psi_z)
print(f"ZTMPS: {psi_z.n} pairs = {psi_z.chain.n} chain sites, "
      f"ranks={np.asarray(psi_z.chain.ranks)}")

# ## 2. The operator is NOT unitary
#
# The DT's elementary gates include dampedH and R(wr) with entries
# e^{-wr/2} < 1 (reference src/circuits/dt_gates.jl:11-25) — the transform
# contracts amplitudes. This breaks the free canonical form that unitary
# circuits enjoy, which is why the builder re-gauges before every
# truncation (reference docs/src/core_concepts.md:158-166; here the
# canonical two-site polish inside ops.apply.compose_layers).

W = build_dt_mpo(n, wr, cutoff=1e-12)
print(f"DT MPO: max bond = {int(max_bond(W))} (plateau ~17-18)")

# ## 3. Basis-state action, read element by element
#
# Apply to the encoded signal; the output at (k, j0) should equal
#     (1/sqrt N) e^{-wr k j0 / N} x_{j0}.
# The readout configuration interleaves main/copy bits with the MAIN
# (output k) bits LSB-first (bit-reversed, as with the QFT) and the COPY
# (input j) bits LSB-first as well:

out = apply(W, psi_z)
k, j0 = 5, 3
cfg = interleave_bits(
    int_to_bits(k, n, order="lsb"), int_to_bits(j0, n, order="lsb")
)
got = complex(coefficient(out, np.asarray(cfg)))
want = x[j0] * np.exp(-wr * k * j0 / N) / np.sqrt(N)
print(f"chi({k}; j0={j0}) = {got.real:.8f}  analytic {want:.8f}")

# ## 4. Sweeping the damping axis through the pipeline API
#
# DTPipeline packages encode -> apply -> batched readout; coefficients
# along k for fixed j0 trace the signal's decay profile:

pipe = DTPipeline(n, wr, chi=32, cutoff=1e-10, dtype=jnp.complex128)
out2 = pipe.forward(pipe.encode(x))
ks = np.arange(16)
j_sel = np.full(16, 3)
vals = np.asarray(pipe.coefficients(out2, ks, j_sel))
expected = x[3] * np.exp(-wr * ks * 3 / N) / np.sqrt(N)
print("max DT readout error:", np.abs(vals - expected).max())

# ## 5. What wr means
#
# wr sets the radial sampling density of the eventual z-plane grid:
# z(k, l) = e^{-(wr k + i wi l)/N} places the k-th radial shell at
# |z| = e^{-wr k / N}. Large wr spans deep into the unit disk with few k;
# small wr concentrates shells near |z| = 1 where signal poles live. The
# pole-search workflow exploits exactly this: coarse scan at wr = 2 pi,
# then rebuild at wr = 0.5 to zoom radially (reference
# docs/src/tutorials/zt.jl:340-364). Because the builder takes wr as a
# TRACED argument, rebuilding at a new wr reuses the compiled program —
# only the gate tensors change.

for wr_probe in (0.5, 2 * np.pi):
    Wp = build_dt_mpo(n, wr_probe, cutoff=1e-12)
    print(f"wr={wr_probe:5.2f}: innermost shell |z| = "
          f"{np.exp(-wr_probe * (N - 1) / N):.4f}, max bond "
          f"{int(max_bond(Wp))}")
