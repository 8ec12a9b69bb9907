"""QFT MPO builder.

Re-design of reference src/transforms/qft_transformer.jl:121-160. The
reference zips each successive controlled-phase layer into the accumulated
MPO with a no-truncation bottom-up sweep (zip_up_mpos, :13-66) followed by a
truncating top-down sweep (zip_down_mpos, :69-101). Here the build is a
single ``lax.scan`` over the stacked layer MPOs whose body is the fused
zip-up composition + canonical polish sweeps (ops.apply.compose_layers) —
operator-equivalent, shape-static, and one compiled program whose size does
not grow with n.

The result is the bit-reversed DFT operator Q_n (site 1 of the output holds
the LSB of the frequency index), tested against qn_matrix
(reference test/test_qft_transformer.jl:23-33, 331-374).
The max bond dimension saturates at 8 (reference docs/src/benchmarking.md:211-213).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

from qilaplace_tpu.circuits.qft_gates import control_Hphase_mpo
from qilaplace_tpu.core.mpo import MPO, identity_mpo, mpo_repad
from qilaplace_tpu.ops.apply import compose_layers, embed_window, stack_layers
from qilaplace_tpu.utils.config import bucket_for

_STATIC_BUILD_QFT_MPO = ("n", "cutoff", "maxdim", "chi", "dtype", "chi_work")


@partial(jax.jit, static_argnames=_STATIC_BUILD_QFT_MPO)
def build_qft_mpo(
    n: int,
    *,
    cutoff: float = 1e-14,
    maxdim: int = 1000,
    chi: int | None = None,
    dtype=np.complex128,
    chi_work: int | None = None,
) -> MPO:
    """Build the n-site QFT MPO (bit-reversed DFT with the -2*pi*i phase
    convention and 1/sqrt(N) normalization)."""
    if n < 1:
        raise ValueError(f"build_qft_mpo: n must be >= 1, got {n}")
    if chi is None:
        chi = bucket_for(min(maxdim, 16))  # plateau is 8; headroom for sweeps
    # no bond of an n-site operator chain can exceed 4^(n//2)
    chi = min(chi, bucket_for(4 ** (n // 2)))
    maxdim = min(maxdim, chi)

    if n == 1:
        return mpo_repad(control_Hphase_mpo(1, dtype=dtype), chi)

    layers = [
        embed_window(control_Hphase_mpo(n - it, dtype=dtype), n, it)
        for it in range(n)
    ]
    layer_cores, layer_ranks = stack_layers(layers)
    # sequential prefix fold — mid-segment layer products are NOT low-rank,
    # so a balanced pair tree cannot replace this (see transforms/dt.py)
    acc = identity_mpo(n, chi=chi, dtype=jnp.dtype(dtype))
    return compose_layers(
        acc, layer_cores, layer_ranks, cutoff=cutoff, maxdim=maxdim,
        chi_work=chi_work,
    )
