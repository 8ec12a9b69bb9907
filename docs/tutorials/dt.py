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
# (output k) bits LSB-first (bit-reversed, as with the QFT) while the
# COPY register — never transformed by the DT — keeps the MSB-first
# ENCODE convention. (In the full zT both registers are transformed and
# both come out LSB-first.)

out = apply(W, psi_z)
k, j0 = 5, 3
cfg = interleave_bits(
    int_to_bits(k, n, order="lsb"), int_to_bits(j0, n)
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

# ## 6. Reading the DT as a physical Laplace transform
#
# (reference dt.jl:13-42) The continuum Laplace transform
#
#   L(s) = int_0^inf f(t) e^{-s t} dt,  s >= 0,
#
# has the finite-grid Riemann approximation
#
#   L(s_k) ~= dt * sum_j f(t_j) e^{-s_k t_j},   t_j = j dt, s_k = k ds.
#
# The DT kernel is y_k = (1/sqrt N) sum_j x_j e^{-wr k j / N}; choosing
#
#   wr = N * ds * dt
#
# makes e^{-wr k j / N} == e^{-s_k t_j}, so the physical Laplace values
# are recovered as L(s_k) ~= dt * sqrt(N) * y_k.
#
# The transformed amplitudes live on the main register with the copy
# register still carrying the input index j; y_k is the sum of the
# (k_LSB, j) amplitudes over ALL j — a marginalization of the copy rail.
# The reference loops `coefficient` over j (dt.jl:187-197); here all
# (k, j) pairs of a k-window form ONE batched device readout:

from qilaplace_tpu.core.mps import coefficient_batch


def laplace_values(out_state, ks, n, dt):
    N = 2**n
    kb = np.array([int_to_bits(int(k), n, order="lsb") for k in ks])
    jb = np.array([int_to_bits(int(j), n) for j in range(N)])
    cfgs = np.array(
        [interleave_bits(kb[i], jb[j]) for i in range(len(ks))
         for j in range(N)]
    )
    vals = np.asarray(coefficient_batch(out_state, cfgs)).reshape(len(ks), N)
    return dt * np.sqrt(N) * vals.sum(axis=1)


# ## 7. Example 1: polynomial times exponential
#
# f(t) = t e^{-a t}. With r = e^{-(s + a) dt}, the exact DISCRETE Laplace
# sum is the differentiated geometric series
#
#   L_disc(s) = dt^2 sum_j j r^j
#             = dt^2 r (1 - N r^{N-1} + (N-1) r^N) / (1 - r)^2,
#
# and the continuum limit is L(s) = 1 / (s + a)^2. We validate against the
# discrete form (exact at any N); the continuum value differs by the
# O(dt) Riemann error, which is a property of the grid, not the method.

n_ex = 7
N_ex = 2**n_ex
dt_ex, ds_ex = 0.05, 0.08
wr_ex = N_ex * ds_ex * dt_ex
t_ex = dt_ex * np.arange(N_ex)
s_ex = ds_ex * np.arange(N_ex)

a_poly = 0.5
x_poly = t_ex * np.exp(-a_poly * t_ex)

psi_poly = signal_ztmps(x_poly, cutoff=1e-12, maxdim=256)
W_poly = build_dt_mpo(n_ex, wr_ex, cutoff=1e-12, maxdim=256)
out_poly = apply(W_poly, psi_poly)


def discrete_texp(s, a, dt, N):
    r = np.exp(-(s + a) * dt)
    return dt**2 * r * (1 - N * r ** (N - 1) + (N - 1) * r**N) / (1 - r) ** 2


L_mps_poly = laplace_values(out_poly, np.arange(N_ex), n_ex, dt_ex).real
L_disc_poly = discrete_texp(s_ex, a_poly, dt_ex, N_ex)
print(f"t e^-at:  max |L_mps - L_disc| = "
      f"{np.abs(L_mps_poly - L_disc_poly).max():.3e}")

# ## 8. Example 2: cosine times exponential
#
# f(t) = e^{-a t} cos(b t). With alpha = e^{(-(s + a) + i b) dt} the exact
# discrete sum is one geometric series,
#
#   L_disc(s) = dt * Re[(1 - alpha^N) / (1 - alpha)],
#
# continuum limit L(s) = (s + a) / ((s + a)^2 + b^2).

a_cos, b_cos = 0.3, 3.0
x_cos = np.exp(-a_cos * t_ex) * np.cos(b_cos * t_ex)

psi_cos = signal_ztmps(x_cos, cutoff=1e-12, maxdim=256)
out_cos = apply(W_poly, psi_cos)  # same grid -> same MPO, reused


def discrete_cosexp(s, a, b, dt, N):
    alpha = np.exp((-(s + a) + 1j * b) * dt)
    return dt * ((1 - alpha**N) / (1 - alpha)).real


L_mps_cos = laplace_values(out_cos, np.arange(N_ex), n_ex, dt_ex).real
L_disc_cos = discrete_cosexp(s_ex, a_cos, b_cos, dt_ex, N_ex)
print(f"e^-at cos bt: max |L_mps - L_disc| = "
      f"{np.abs(L_mps_cos - L_disc_cos).max():.3e}")

# ## 9. Figures
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

fig, axes = plt.subplots(1, 2, figsize=(12, 4), constrained_layout=True)
for ax, (L_mps, L_disc, title) in zip(
    axes,
    [(L_mps_poly, L_disc_poly, "f(t) = t exp(-a t)"),
     (L_mps_cos, L_disc_cos, "f(t) = exp(-a t) cos(b t)")],
):
    ax.plot(s_ex, L_disc, lw=2, label="analytical discrete")
    ax.plot(s_ex, L_mps, lw=2, ls="--", label="MPS")
    ax2 = ax.twinx()
    ax2.semilogy(s_ex, np.abs(L_mps - L_disc) + 1e-30, lw=1, ls=":",
                 color="0.5", label="abs error")
    ax2.set_ylabel("abs error")
    ax.set_title(title)
    ax.set_xlabel("s")
    ax.set_ylabel("L(s)")
    ax.legend(loc="upper right")
fig.savefig(os.path.join(_figdir, "dt_laplace.svg"))
print("figure written to docs/assets/tutorials/dt_laplace.svg")

# The error curves sit at the truncation floor across the whole s-range:
# the compressed pipeline reproduces the exact discrete Laplace transform,
# and the remaining gap to the CONTINUUM L(s) is pure grid discretization.
