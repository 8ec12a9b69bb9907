"""Benchmark harness shared utilities.

Mirrors reference scripts/benchmark/common.jl: machine metadata capture
(:29-42), incremental & resumable per-n result series with parameter-mismatch
detection (:127-221), per-method time budgets that stop one series without
killing others, and max-bond probes (:227-249). Artifacts are JSON files
under scripts/benchmark/results/ (the reference uses JLD2).
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time
from dataclasses import dataclass, field

import numpy as np

# Honor an explicit backend request before jax initializes (the sandbox's
# sitecustomize pins JAX_PLATFORMS to a tunneled TPU; env vars alone cannot
# override it once jax is imported).
if os.environ.get("QILAPLACE_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["QILAPLACE_PLATFORM"])

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "results")


def machine_metadata(extra=None):
    import jax

    meta = {
        "python": sys.version.split()[0],
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "platform": platform.platform(),
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    if extra:
        meta.update(extra)
    return meta


@dataclass
class Series:
    """One method's incremental sweep over n, persisted per point."""

    name: str
    params: dict
    points: dict = field(default_factory=dict)  # str(n) -> record

    def has_point(self, n: int) -> bool:
        return str(n) in self.points

    def add_point(self, n: int, record: dict):
        self.points[str(n)] = record


class BenchmarkStore:
    """JSON artifact with metadata + named series; restarts a series when its
    parameters change (reference common.jl:195-221)."""

    def __init__(self, name: str, meta_params: dict):
        os.makedirs(RESULTS_DIR, exist_ok=True)
        self.path = os.path.join(RESULTS_DIR, f"{name}.json")
        self.name = name
        self.meta_params = meta_params
        self.data = {"meta": machine_metadata(), "params": meta_params, "series": {}}
        if os.path.exists(self.path) and not os.environ.get("REBENCHMARK"):
            try:
                old = json.load(open(self.path))
                if old.get("params") == meta_params:
                    self.data = old
                else:
                    print(
                        f"[{name}] parameter mismatch — restarting sweep",
                        file=sys.stderr,
                    )
            except Exception as e:
                print(f"[{name}] could not load artifact: {e}", file=sys.stderr)

    def series(self, name: str, params: dict) -> Series:
        raw = self.data["series"].get(name)
        if raw is not None and raw.get("params") == params:
            return Series(name=name, params=params, points=raw["points"])
        return Series(name=name, params=params)

    def save(self, *series: Series):
        for s in series:
            self.data["series"][s.name] = {"params": s.params, "points": s.points}
        self.data["meta"] = machine_metadata()
        json.dump(self.data, open(self.path, "w"), indent=1)


def timed(fn, *args, warmup: int = 1, repeats: int = 3):
    """Wall-clock a jitted callable (median of repeats after warmup); returns
    (seconds, last_result)."""
    import jax

    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), out


def banner(text: str):
    print("=" * 70, file=sys.stderr)
    print(text, file=sys.stderr)
    print("=" * 70, file=sys.stderr)


class TimeBudget:
    """Per-series budget: once a single point exceeds it, skip larger n
    (reference TIME_TO_STOP, scripts/benchmark/tt_decomp.jl:29-41)."""

    def __init__(self, seconds: float):
        self.seconds = seconds
        self.exceeded = False

    def note(self, elapsed: float):
        if elapsed > self.seconds:
            self.exceeded = True
        return self.exceeded


# Cusp benchmark parameters (reference scripts/benchmark/common.jl:60-63)
_CUSP_A = (0.6, -0.4, 0.5, 0.35)
_CUSP_B = (80.0, 120.0, 90.0, 100.0)
_CUSP_C = (0.2, 0.45, 0.62, 0.85)


def make_signal(kind: str, n: int, *, seed: int = 1234):
    """Benchmark signal factory, including the two benchmark-only kinds of
    reference scripts/benchmark/common.jl:66-92 (:sine20, :sin_cusp) on top
    of the public generate_signal kinds."""
    import jax.numpy as jnp

    from qilaplace_tpu import generate_signal

    N = 2**n
    if kind == "sin":
        return generate_signal(n, kind="sin", dt=1.0, freq=2 * np.pi * 2 / N)
    if kind == "multi_sin":
        return generate_signal(n, kind="multi_sin", dt=5.0 / N)
    if kind == "multi_sin_exp":
        return generate_signal(n, kind="multi_sin_exp", dt=5.0 / N,
                               omega_scale=150.0)
    if kind == "abs_cos_power_p8":
        return generate_signal(n, kind="abs_cos_power_p8", dt=5.0 / N)
    if kind == "sine20":
        freqs = [2 * np.pi * k / N for k in range(1, 21)]
        return generate_signal(n, kind="sin", dt=1.0, freq=freqs)
    if kind == "sin_cusp":
        x = jnp.arange(N) / max(N - 1, 1)
        out = jnp.cos(2 * np.pi * x)
        for a, b, c in zip(_CUSP_A, _CUSP_B, _CUSP_C):
            out = out + a * jnp.exp(-b * jnp.abs(x - c))
        return out
    if kind == "random":
        return generate_signal(n, kind="random", seed=seed + n)
    raise ValueError(f"make_signal: unknown kind {kind}")
