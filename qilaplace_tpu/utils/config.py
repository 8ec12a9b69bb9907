"""Global defaults: dtypes and chi buckets.

The reference works in Float64/ComplexF64 throughout. On TPU, f64 is
emulated, so the default compute dtype is configurable: parity tests run in
complex128 on CPU; the performance path runs complex64 on TPU.

Chi buckets: ITensors resizes bonds dynamically; we instead pad every bond to
a static bucket so each sweep compiles once. Buckets cover the reference's
measured MPO bond plateaus (QFT 8, DT ~18, zT ~92;
reference docs/src/benchmarking.md:211-219).
"""

from __future__ import annotations

import jax.numpy as jnp

# Padded bond-dimension buckets (MXU-friendly; 8 = f32 sublane, 128 = lane).
CHI_BUCKETS = (8, 16, 32, 64, 128, 256, 512)


def bucket_for(chi: int) -> int:
    """Smallest bucket >= chi."""
    for b in CHI_BUCKETS:
        if b >= chi:
            return b
    return int(chi)


def complex_dtype(dtype) -> jnp.dtype:
    """The complex dtype matching a real or complex input dtype."""
    dtype = jnp.dtype(dtype)
    if dtype in (jnp.complex64, jnp.complex128):
        return dtype
    if dtype == jnp.float64:
        return jnp.dtype(jnp.complex128)
    return jnp.dtype(jnp.complex64)


def real_dtype(dtype) -> jnp.dtype:
    dtype = jnp.dtype(dtype)
    if dtype == jnp.complex128:
        return jnp.dtype(jnp.float64)
    if dtype == jnp.complex64:
        return jnp.dtype(jnp.float32)
    return dtype


import functools

import jax


def highest_precision(fn):
    """Trace ``fn`` under HIGHEST matmul precision.

    TPU matmuls default to bf16 inputs (~1e-3 element error), which is far
    too coarse for tensor-network sweeps and the complex-linalg fallbacks;
    every public compute entry point wraps itself with this so contractions
    accumulate in full f32 regardless of global configuration.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
