"""Damping-transform gates: controlled damping blocks on the paired register.

Re-design of reference src/circuits/dt_gates.jl. Both block builders return a
PairedSiteMPO on an interleaved window [main_1, copy_1, ..., main_L, copy_L];
embed into the full 2n chain with ops.apply.embed_window. Non-unitary gates:
dampedH (src/circuits/dt_gates.jl:11-17) and R (:19-25).

The damping parameter ``wr`` is a *traced* value: gate tensors are built with
jnp ops, so transform builds compile once per (n, chi) and run for any wr —
the coarse-to-fine pole workflow rebuilds the zT MPO at several wr values
(reference docs/src/tutorials/zt.jl:304,345) without recompiling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO, mpo_from_traced
from qilaplace_tpu.circuits.qft_gates import I2, proj


def dampedH(wr, dtype=jnp.complex128) -> jax.Array:
    """(1/sqrt2) [[1, 1], [1, e^{-wr/2}]] — non-unitary damped Hadamard."""
    wr = jnp.asarray(wr)
    isq = 1.0 / np.sqrt(2.0)
    out = jnp.asarray([[isq, isq], [isq, 0.0]], dtype=dtype)
    return out.at[1, 1].set((isq * jnp.exp(-wr / 2.0)).astype(dtype))


def R(wr, dtype=jnp.complex128) -> jax.Array:
    """diag(1, e^{-wr}) — real damping rotation."""
    wr = jnp.asarray(wr)
    out = jnp.asarray([[1.0, 0.0], [0.0, 0.0]], dtype=dtype)
    return out.at[1, 1].set(jnp.exp(-wr).astype(dtype))


def _core(l, r, dtype):
    return jnp.zeros((l, 2, 2, r), dtype=dtype)


def control_damping_mpo(n: int, k: int, wr, dtype=np.complex128) -> PairedSiteMPO:
    """Damping block with control on main_k, targets R(wr*2^{l-k-1}) on
    main_{l<k}; identities thread the copy register
    (reference control_damping_mpo, src/circuits/dt_gates.jl:30-130).
    Window: pairs 1..k (2k chain sites). The control site acts as
    "project input bit, then dampedH" (verified against the analytic DT
    kernel, reference test/test_dt_transformer.jl:60-238).
    """
    if k < 1:
        raise ValueError(f"control_damping_mpo: k must be >= 1, got {k}")
    dtype = jnp.dtype(dtype)
    eye = jnp.asarray(I2, dtype=dtype)
    if k == 1:
        cores = [
            dampedH(wr, dtype).reshape(1, 2, 2, 1),
            eye.reshape(1, 2, 2, 1),
        ]
        return PairedSiteMPO(chain=mpo_from_traced(cores))
    cores = []
    for l in range(1, k):
        wfac = jnp.asarray(wr) * (2.0 ** (l - k - 1))
        lb = 1 if l == 1 else 2
        Wm = _core(lb, 2, dtype)
        if l == 1:
            Wm = Wm.at[0, :, :, 0].set(eye).at[0, :, :, 1].set(R(wfac, dtype))
        else:
            Wm = Wm.at[0, :, :, 0].set(eye).at[1, :, :, 1].set(R(wfac, dtype))
        cores.append(Wm)
        Wc = _core(2, 2, dtype).at[0, :, :, 0].set(eye).at[1, :, :, 1].set(eye)
        cores.append(Wc)
    Wm = _core(2, 2, dtype)
    dH = dampedH(wr, dtype)
    for c in range(2):
        Wm = Wm.at[c, :, :, c].set(dH @ jnp.asarray(proj(c), dtype=dtype))
    cores.append(Wm)
    Wc = _core(2, 1, dtype).at[0, :, :, 0].set(eye).at[1, :, :, 0].set(eye)
    cores.append(Wc)
    return PairedSiteMPO(chain=mpo_from_traced(cores))


def control_damping_copy_mpo(n: int, k: int, wr, dtype=np.complex128) -> PairedSiteMPO:
    """Damping block with control on copy_k (projector reads the copy bit),
    targets R(wr*2^{j-2}) on main_{k+j-1}, j = 2..L
    (reference control_damping_copy_mpo, src/circuits/dt_gates.jl:133-229).
    Window: pairs k..n (L = n-k+1 pairs, 2L chain sites); embed at chain
    offset 2(k-1).
    """
    if k < 1:
        raise ValueError(f"control_damping_copy_mpo: k must be >= 1, got {k}")
    L = n - k + 1
    if L < 1:
        raise ValueError("control_damping_copy_mpo: window is empty (k > n)")
    dtype = jnp.dtype(dtype)
    eye = jnp.asarray(I2, dtype=dtype)
    if L == 1:
        cores = [eye.reshape(1, 2, 2, 1), eye.reshape(1, 2, 2, 1)]
        return PairedSiteMPO(chain=mpo_from_traced(cores))
    cores = [_core(1, 1, dtype).at[0, :, :, 0].set(eye)]
    Wc = _core(1, 2, dtype)
    for c in range(2):
        Wc = Wc.at[0, :, :, c].set(jnp.asarray(proj(c), dtype=dtype))
    cores.append(Wc)
    for j in range(2, L):
        wfac = jnp.asarray(wr) * (2.0 ** (j - 2))
        Wm = _core(2, 2, dtype).at[0, :, :, 0].set(eye).at[1, :, :, 1].set(
            R(wfac, dtype)
        )
        cores.append(Wm)
        Wc = _core(2, 2, dtype).at[0, :, :, 0].set(eye).at[1, :, :, 1].set(eye)
        cores.append(Wc)
    wfac = jnp.asarray(wr) * (2.0 ** (L - 2))
    Wm = _core(2, 2, dtype).at[0, :, :, 0].set(eye).at[1, :, :, 1].set(
        R(wfac, dtype)
    )
    cores.append(Wm)
    Wc = _core(2, 1, dtype).at[0, :, :, 0].set(eye).at[1, :, :, 0].set(eye)
    cores.append(Wc)
    return PairedSiteMPO(chain=mpo_from_traced(cores))
