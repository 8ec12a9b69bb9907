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

import numpy as np

import jax
import jax.numpy as jnp

_LEGACY_N_TERMS = 10


def _jvals(n: int, dtype):
    return jnp.arange(2**n, dtype=dtype)


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
    j = _jvals(n, dtype)

    if kind == "sin":
        phase = kwargs.get("phase", 0.0)
        phase_arr = (
            np.zeros_like(freq_arr)
            if phase is None
            else np.atleast_1d(np.asarray(phase, dtype=np.float64))
        )
        if np.isscalar(freq_val) or np.asarray(freq_val).ndim == 0:
            out = jnp.sin(freq_arr[0] * dt * j + float(phase_arr[0]))
        else:
            if phase is None or np.asarray(phase).ndim == 0:
                phase_arr = np.zeros_like(freq_arr) + phase_arr[0]
            if len(phase_arr) != len(freq_arr):
                raise ValueError("freq and phase vectors must have equal length")
            out = jnp.zeros_like(j)
            for w, ph in zip(freq_arr, phase_arr):
                out = out + jnp.sin(w * dt * j + ph)
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
        out = jnp.zeros_like(j)
        for a, w in zip(ak, wk):
            out = out + a * jnp.sin(w * j)
        return out

    if kind == "sin_decay":
        decay = kwargs.get("decay_rate", 1.0)
        phase = kwargs.get("phase", None)
        decay_arr = np.atleast_1d(np.asarray(decay, dtype=np.float64))
        if np.asarray(freq_val).ndim == 0:
            ph = 0.0 if phase is None else float(np.atleast_1d(phase)[0])
            return jnp.sin(freq_arr[0] * dt * j + ph) * jnp.exp(
                -decay_arr[0] * dt * j
            )
        if len(decay_arr) != len(freq_arr):
            raise ValueError("freq and decay_rate vectors must have equal length")
        phase_arr = (
            np.zeros_like(freq_arr)
            if phase is None
            else np.atleast_1d(np.asarray(phase, dtype=np.float64))
        )
        if len(phase_arr) != len(freq_arr):
            raise ValueError("freq and phase vectors must have equal length")
        out = jnp.zeros_like(j)
        for w, lam, ph in zip(freq_arr, decay_arr, phase_arr):
            out = out + jnp.sin(w * dt * j + ph) * jnp.exp(-lam * dt * j)
        return out

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
        out = jnp.zeros_like(j)
        for a, w, lam in zip(ak, wk, lk):
            out = out + a * jnp.sin(w * j) * jnp.exp(lam * j)
        return out

    if kind == "abs_cos_power_p8":
        power = float(kwargs.get("power", 0.8))
        return jnp.abs(jnp.cos(2 * np.pi * dt * j)) ** power

    raise ValueError(
        f"Unsupported signal kind: {kind}. Supported: sin, multi_sin, "
        "sin_decay, multi_sin_exp, abs_cos_power_p8, random."
    )
