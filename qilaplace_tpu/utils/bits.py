"""Bit-ordering helpers.

The quantics encoding is big-endian: site 1 carries the most-significant bit
of the sample index (reference src/signals/SignalConverters.jl:39-41,
docs/src/core_concepts.md:32-41). Transform outputs come out bit-reversed
(LSB-first at site 1, reference test/test_qft_transformer.jl:23-33), and the
paired register interleaves main/copy bits
(reference docs/src/tutorials/zt.jl:59-67).

These helpers exist in two flavours: plain-Python (for test oracles and
static index construction) and jax (traceable, for vmapped readout grids).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


# ----------------------------- python / numpy -----------------------------

def int_to_bits(val: int, n: int, *, order: str = "msb") -> list[int]:
    """Bits of ``val`` as a length-``n`` list. ``order``: 'msb' or 'lsb'."""
    if val < 0:
        raise ValueError("int_to_bits: value must be non-negative")
    bits = [(val >> i) & 1 for i in range(n)]  # lsb-first
    if val >> n:
        raise ValueError(f"int_to_bits: {val} does not fit in {n} bits")
    if order == "msb":
        return bits[::-1]
    if order == "lsb":
        return bits
    raise ValueError("order must be 'msb' or 'lsb'")


def bits_to_int(bits, *, order: str = "msb") -> int:
    """Inverse of :func:`int_to_bits`."""
    if order == "msb":
        seq = bits
    elif order == "lsb":
        seq = list(bits)[::-1]
    else:
        raise ValueError("order must be 'msb' or 'lsb'")
    val = 0
    for b in seq:
        val = (val << 1) | (int(b) & 1)
    return val


def bit_reverse(val: int, n: int) -> int:
    """Reverse the n-bit representation of ``val``."""
    return bits_to_int(int_to_bits(val, n, order="lsb"), order="msb")


def interleave_bits(main_bits, copy_bits) -> list[int]:
    """[m1, c1, m2, c2, ...] interleaving for the paired 2n-site register."""
    if len(main_bits) != len(copy_bits):
        raise ValueError("main_bits and copy_bits must have the same length")
    out = []
    for m, c in zip(main_bits, copy_bits):
        out.append(int(m))
        out.append(int(c))
    return out


def int_to_paired_bits(val: int, n: int, *, order: str = "msb") -> list[int]:
    """Interleaved [b1,b1,b2,b2,...] bits of ``val`` (|j>|j> configuration)."""
    b = int_to_bits(val, n, order=order)
    return interleave_bits(b, b)


def bit_reversal_permutation(n: int) -> np.ndarray:
    """Permutation p with p[j] = bit_reverse(j, n); p is an involution."""
    N = 1 << n
    p = np.zeros(N, dtype=np.int64)
    for j in range(N):
        p[j] = bit_reverse(j, n)
    return p


# ------------------------------- jax (traced) ------------------------------

def jnp_int_to_bits(vals, n: int, *, order: str = "msb"):
    """Bits of an integer array ``vals`` -> shape ``vals.shape + (n,)``."""
    vals = jnp.asarray(vals)
    shifts = jnp.arange(n)
    if order == "msb":
        shifts = shifts[::-1]
    return (vals[..., None] >> shifts) & 1


def jnp_interleave_bits(main_bits, copy_bits):
    """Interleave along the last axis: (..., n) x (..., n) -> (..., 2n)."""
    stacked = jnp.stack([main_bits, copy_bits], axis=-1)
    return stacked.reshape(*stacked.shape[:-2], -1)


def paired_config_from_kl(ks, ls, n: int):
    """(k, l) integer grids -> interleaved LSB-first readout configurations.

    zT/DT outputs address the main register by the bits of k LSB-first and the
    copy register by the bits of l LSB-first
    (reference docs/src/tutorials/zt.jl:152-157).
    Shapes: ks, ls broadcastable -> (..., 2n) int32 config array.
    """
    kb = jnp_int_to_bits(ks, n, order="lsb")
    lb = jnp_int_to_bits(ls, n, order="lsb")
    return jnp_interleave_bits(kb, lb)
