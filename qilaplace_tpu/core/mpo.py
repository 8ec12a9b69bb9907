"""Static-shape MPO containers.

Replaces reference src/mpo.jl (SingleSiteMPO / PairedSiteMPO, :26-74). A core
is ``W[l, s_out, s_in, r]``; the operator acts as
``out[s_out] = sum_{s_in} W[..., s_out, s_in, ...] psi[s_in]`` and composition
``apply_mpo_mpo(A, B)`` means "A first, then B" at the dense level
(matching the reference's prime-index contraction order in
src/linalg/apply.jl:92-101,164-171).

The reference's PairedSiteMPO is its 2n-site interleaved SingleSiteMPO plus
bookkeeping (src/linalg/apply.jl:16-58); here the interleaved chain is the
storage and ``PairedSiteMPO`` is a thin view.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qilaplace_tpu.utils.config import bucket_for
from qilaplace_tpu.utils.config import highest_precision


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cores", "ranks"],
    meta_fields=[],
)
@dataclasses.dataclass
class MPO:
    """Padded matrix-product operator.

    cores: [n, chi, 2, 2, chi] with axes (left, s_out, s_in, right)
    ranks: [n+1] int32 valid bond dimensions, ranks[0] == ranks[n] == 1.
    Zero-padding invariant as in core.mps.MPS.
    """

    cores: jax.Array
    ranks: jax.Array

    @property
    def n(self) -> int:
        return self.cores.shape[0]

    @property
    def chi(self) -> int:
        return self.cores.shape[1]

    @property
    def dtype(self):
        return self.cores.dtype

    def __len__(self) -> int:
        return self.n

    @staticmethod
    def from_core_list(core_list, chi: int | None = None) -> "MPO":
        """Stack variable-size cores ``[l_i, 2, 2, r_i]`` into a padded MPO."""
        n = len(core_list)
        ranks = [1] + [c.shape[3] for c in core_list]
        if core_list[0].shape[0] != 1 or core_list[-1].shape[3] != 1:
            raise ValueError("edge cores must have boundary bond dimension 1")
        if chi is None:
            chi = bucket_for(max(ranks))
        dtype = np.result_type(*[np.asarray(c).dtype for c in core_list])
        cores = np.zeros((n, chi, 2, 2, chi), dtype=dtype)
        for i, c in enumerate(core_list):
            l, so, si, r = c.shape
            if (so, si) != (2, 2):
                raise ValueError("physical dimensions must be 2x2")
            if l != ranks[i] or l > chi or r > chi:
                raise ValueError("core shapes inconsistent with ranks/chi")
            cores[i, :l, :, :, :r] = c
        return MPO(
            cores=jnp.asarray(cores),
            ranks=jnp.asarray(ranks, dtype=jnp.int32),
        )

    def to_core_list(self):
        cores = np.asarray(self.cores)
        ranks = np.asarray(self.ranks)
        return [
            cores[i, : ranks[i], :, :, : ranks[i + 1]] for i in range(self.n)
        ]


SingleSiteMPO = MPO


@partial(
    jax.tree_util.register_dataclass, data_fields=["chain"], meta_fields=[]
)
@dataclasses.dataclass
class PairedSiteMPO:
    """Paired-register MPO = interleaved 2n-site chain view
    (reference src/mpo.jl:54-74)."""

    chain: MPO

    @property
    def n(self) -> int:
        return self.chain.n // 2

    def __len__(self) -> int:
        return self.n


def _mpo_chain(W) -> MPO:
    return W.chain if isinstance(W, PairedSiteMPO) else W


def _mpo_rewrap(W, chain: MPO):
    return PairedSiteMPO(chain=chain) if isinstance(W, PairedSiteMPO) else chain


def identity_mpo(n: int, *, chi: int = 1, dtype=jnp.complex64, paired: bool = False):
    """Identity operator on n sites (2n chain sites if paired);
    reference SingleSiteMPO(n)/PairedSiteMPO(n), src/mpo.jl:77-147."""
    n_chain = 2 * n if paired else n
    eye = np.zeros((1, 2, 2, 1))
    eye[0, :, :, 0] = np.eye(2)
    W = MPO.from_core_list([eye] * n_chain, chi=chi)
    W = MPO(cores=W.cores.astype(dtype), ranks=W.ranks)
    return PairedSiteMPO(chain=W) if paired else W


@highest_precision
def mpo_to_dense(W) -> jax.Array:
    """Dense operator matrix [2^n, 2^n] with site 1 = most significant bit
    on both the row (s_out) and column (s_in) index. Test/small-n only."""
    m = _mpo_chain(W)
    n = m.n
    T = m.cores[0][0]  # [2, 2, chi]
    for i in range(1, n):
        T = jnp.tensordot(T, m.cores[i], axes=[[T.ndim - 1], [0]])
    T = T[..., 0]  # axes: o1, i1, o2, i2, ...
    perm = [2 * i for i in range(n)] + [2 * i + 1 for i in range(n)]
    T = jnp.transpose(T, perm)
    return T.reshape(2**n, 2**n)


def mpo_from_traced(core_list, chi: int | None = None) -> MPO:
    """Stack traced (jnp) cores ``[l_i, 2, 2, r_i]`` into a padded MPO.

    Like MPO.from_core_list but for cores holding traced values (e.g. gate
    tensors parameterized by a traced damping wr); ranks come from the
    static shapes."""
    ranks = [1] + [int(c.shape[3]) for c in core_list]
    if core_list[0].shape[0] != 1 or core_list[-1].shape[3] != 1:
        raise ValueError("edge cores must have boundary bond dimension 1")
    if chi is None:
        chi = bucket_for(max(ranks))
    padded = [
        jnp.pad(
            c,
            (
                (0, chi - c.shape[0]),
                (0, 0),
                (0, 0),
                (0, chi - c.shape[3]),
            ),
        )
        for c in core_list
    ]
    return MPO(
        cores=jnp.stack(padded, axis=0),
        ranks=jnp.asarray(ranks, dtype=jnp.int32),
    )


def mpo_repad(W, chi_new: int):
    """Re-pad MPO bonds to a new static bucket (see core.mps.repad; shrink
    checks the leading-block precondition on concrete inputs)."""
    from qilaplace_tpu.core.mps import _check_shrink

    m = _mpo_chain(W)
    chi = m.chi
    if chi_new == chi:
        return W
    if chi_new > chi:
        pad = chi_new - chi
        cores = jnp.pad(m.cores, ((0, 0), (0, pad), (0, 0), (0, 0), (0, pad)))
    else:
        _check_shrink(m.cores, m.ranks, chi_new, "mpo_repad")
        cores = m.cores[:, :chi_new, :, :, :chi_new]
    ranks = jnp.minimum(m.ranks, chi_new)
    return _mpo_rewrap(W, MPO(cores=cores, ranks=ranks))


def max_bond(obj) -> jax.Array:
    """Largest valid bond dimension (the key model metric in the reference
    benchmarks, scripts/benchmark/common.jl:227-249)."""
    chain = getattr(obj, "chain", obj)
    return jnp.max(chain.ranks)
