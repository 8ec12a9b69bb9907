"""Deterministic test/benchmark signal generators.

Mirrors the signal kinds of reference src/signals/Signals.jl:14-140
(:sin with scalar or vector frequency, :multi_sin, :sin_decay,
:multi_sin_exp, :abs_cos_power_p8, :random) with the same auto time-step
rule dt = 1 / (f_max * 2^n) (reference :207-216).

Signals are generated on-device with jnp so n=30 (2^30 samples) never touches
the host. Random parameters are drawn from seeded jax PRNGs; streams differ
from the reference's Julia Xoshiro, so cross-implementation comparisons on
the random kinds should compare against each library's own oracle, not
sample-by-sample.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_LEGACY_N_TERMS = 10


def _jvals(n: int, dtype):
    return jnp.arange(2**n, dtype=dtype)


@partial(jax.jit, static_argnames=("n", "dtype"))
def _damped_sin_sum(n: int, w, lam, ph, amp, dtype):
    """sum_t amp_t * sin(w_t j + ph_t) * e^{-lam_t j} for j = 0..2^n-1,
    as ONE fused XLA program: the eager op-by-op evaluation materializes a
    4 GiB temporary PER OP at n=30 (measured 191 s of host swapping vs
    ~6 s fused). w/lam/ph/amp: [T] arrays."""
    j = jnp.arange(2**n, dtype=dtype)

    def term(carry, inp):
        w_t, lam_t, ph_t, a_t = inp
        return carry + a_t * jnp.sin(w_t * j + ph_t) * jnp.exp(-lam_t * j), None

    out, _ = jax.lax.scan(
        term, jnp.zeros_like(j), (w, lam, ph, amp)
    )
    return out


@partial(jax.jit, static_argnames=("n", "dtype"))
def _abs_cos_pow(n: int, w, power, dtype):
    j = jnp.arange(2**n, dtype=dtype)
    return jnp.abs(jnp.cos(w * j)) ** power


def _damped_sin(n, w, lam, ph, amp, dtype):
    arr = lambda v: jnp.atleast_1d(jnp.asarray(v, dtype=dtype))
    T = max(np.size(w), np.size(lam), np.size(ph), np.size(amp))
    full = lambda v: jnp.broadcast_to(arr(v), (T,))
    return _damped_sin_sum(n, full(w), full(lam), full(ph), full(amp), dtype)


def generate_signal(
    n: int,
    *,
    kind: str = "sin",
    dt: float | None = None,
    freq=None,
    dtype=jnp.float32,
    **kwargs,
) -> jax.Array:
    """Generate a length-2^n real signal (reference Signals.generate_signal,
    src/signals/Signals.jl:188-235)."""
    if kind == "random":
        seed = int(kwargs.get("seed", 1234))
        return jax.random.normal(jax.random.PRNGKey(seed), (2**n,), dtype=dtype)

    freq_val = (2 * np.pi) if freq is None else freq
    freq_arr = np.atleast_1d(np.asarray(freq_val, dtype=np.float64))
    if dt is None:
        f_max = float(np.max(np.abs(freq_arr)))
        dt = 1.0 if f_max == 0 else 1.0 / (f_max * 2**n)
    dt = float(dt)

    if kind == "sin":
        phase = kwargs.get("phase", 0.0)
        phase_arr = (
            np.zeros_like(freq_arr)
            if phase is None
            else np.atleast_1d(np.asarray(phase, dtype=np.float64))
        )
        if np.isscalar(freq_val) or np.asarray(freq_val).ndim == 0:
            phase_arr = phase_arr[:1]
        else:
            if phase is None or np.asarray(phase).ndim == 0:
                phase_arr = np.zeros_like(freq_arr) + phase_arr[0]
            if len(phase_arr) != len(freq_arr):
                raise ValueError("freq and phase vectors must have equal length")
        out = _damped_sin(n, freq_arr * dt, 0.0, phase_arr, 1.0, dtype)
        noise = float(kwargs.get("noise_level", 0.0))
        if noise > 0:
            seed = int(kwargs.get("seed", 0))
            out = out + noise * jax.random.normal(
                jax.random.PRNGKey(seed), out.shape, dtype=dtype
            )
        return out

    if kind == "multi_sin":
        n_terms = int(kwargs.get("n_terms", _LEGACY_N_TERMS))
        seed_amp = int(kwargs.get("seed_amp", 1001))
        seed_freq = int(kwargs.get("seed_freq", 2002))
        omega_scale = float(kwargs.get("omega_scale", 40.0))
        rng_a = np.random.default_rng(seed_amp)
        rng_w = np.random.default_rng(seed_freq)
        ak = rng_a.random(n_terms)
        ak = ak / np.linalg.norm(ak)
        wk = (omega_scale * dt) * (rng_w.random(n_terms) - 0.5)
        return _damped_sin(n, wk, 0.0, 0.0, ak, dtype)

    if kind == "sin_decay":
        decay = kwargs.get("decay_rate", 1.0)
        phase = kwargs.get("phase", None)
        decay_arr = np.atleast_1d(np.asarray(decay, dtype=np.float64))
        if np.asarray(freq_val).ndim == 0:
            ph = 0.0 if phase is None else float(np.atleast_1d(phase)[0])
            return _damped_sin(n, freq_arr[:1] * dt, decay_arr[:1] * dt, ph,
                               1.0, dtype)
        if len(decay_arr) != len(freq_arr):
            raise ValueError("freq and decay_rate vectors must have equal length")
        phase_arr = (
            np.zeros_like(freq_arr)
            if phase is None
            else np.atleast_1d(np.asarray(phase, dtype=np.float64))
        )
        if len(phase_arr) != len(freq_arr):
            raise ValueError("freq and phase vectors must have equal length")
        return _damped_sin(n, freq_arr * dt, decay_arr * dt, phase_arr, 1.0,
                           dtype)

    if kind == "multi_sin_exp":
        n_terms = int(kwargs.get("n_terms", _LEGACY_N_TERMS))
        seed_amp = int(kwargs.get("seed_amp", 1001))
        seed_freq = int(kwargs.get("seed_freq", 2002))
        seed_decay = int(kwargs.get("seed_decay", 4004))
        omega_scale = float(kwargs.get("omega_scale", 40.0))
        lam_scale = float(kwargs.get("lambda_scale", 2.0))
        rng_a = np.random.default_rng(seed_amp)
        rng_w = np.random.default_rng(seed_freq)
        rng_l = np.random.default_rng(seed_decay)
        ak = rng_a.random(n_terms)
        ak = ak / np.linalg.norm(ak)
        wk = (omega_scale * dt) * (rng_w.random(n_terms) - 0.5)
        lk = -(lam_scale * dt) * rng_l.random(n_terms)
        return _damped_sin(n, wk, -lk, 0.0, ak, dtype)

    if kind == "abs_cos_power_p8":
        power = float(kwargs.get("power", 0.8))
        return _abs_cos_pow(n, 2 * np.pi * dt, power, dtype)

    raise ValueError(
        f"Unsupported signal kind: {kind}. Supported: sin, multi_sin, "
        "sin_decay, multi_sin_exp, abs_cos_power_p8, random."
    )
