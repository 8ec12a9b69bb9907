"""Headline benchmark: zT apply (fused, chi=128) + 4096-point pole scan.

Driver target (BASELINE.json): n=30, chi=128 zT apply + 4096-point pole scan
< 1 s on one TPU chip. Closest published reference number: zT end-to-end
(signal_ztmps + apply) at m=60 (n=30) = 20.036 s on an M2 Max
(reference docs/src/benchmarking.md:307; BASELINE.md row 12). vs_baseline
reports the speedup 20.036 / value.

The timed region is the jitted device program: fused MPO-MPS apply at
maxdim=128 plus a 4096-configuration coefficient scan, returning |chi| (the
tunneled TPU backend cannot transfer complex arrays to the host, so all
fetches are f32). Encode and MPO build are one-time setup (reported to
stderr, not part of the metric).

Prints exactly ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

BASELINE_S = 20.036
CHI = 128
N_SCAN = 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(n: int) -> float:
    from qilaplace_tpu import build_zt_mpo, generate_signal, signal_ztmps
    from qilaplace_tpu.core.mps import coefficient_batch
    from qilaplace_tpu.ops.apply import apply
    from qilaplace_tpu.utils.bits import paired_config_from_kl

    t0 = time.perf_counter()
    x = generate_signal(n, kind="sin_decay", freq=2.0, decay_rate=0.5,
                        dtype=jnp.float32)
    x.block_until_ready()
    log(f"signal n={n} generated in {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    psi = signal_ztmps(
        x, method="rsvd", k=50, p=5, q=2, cutoff=1e-9, maxdim=CHI, chi=CHI
    )
    mps_bond = int(jnp.max(psi.chain.ranks))  # int fetch is supported
    log(
        f"encode (rsvd) in {time.perf_counter() - t0:.2f}s, "
        f"max bond {mps_bond}"
    )

    t0 = time.perf_counter()
    W = build_zt_mpo(n, 2 * np.pi, cutoff=1e-9, maxdim=CHI, chi=CHI,
                     dtype=np.complex64)
    mpo_bond = int(jnp.max(W.chain.ranks))
    log(
        f"zT MPO built in {time.perf_counter() - t0:.2f}s, "
        f"max bond {mpo_bond}"
    )

    rng = np.random.default_rng(0)
    ks = jnp.asarray(rng.integers(0, 2**n, size=N_SCAN))
    ls = jnp.asarray(rng.integers(0, 2**n, size=N_SCAN))
    configs = paired_config_from_kl(ks, ls, n)

    @jax.jit
    def step(W, psi, configs):
        out = apply(W, psi, maxdim=CHI, cutoff=1e-9)
        vals = coefficient_batch(out, configs)
        return jnp.abs(vals).astype(jnp.float32)

    t0 = time.perf_counter()
    first = np.asarray(step(W, psi, configs))  # compile + run + full fetch
    log(
        f"compile+first run {time.perf_counter() - t0:.2f}s, "
        f"|chi| peak {first.max():.3e}"
    )

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(step(W, psi, configs))
        times.append(time.perf_counter() - t0)
    log(f"runs: {['%.4f' % t for t in times]}")
    return float(np.median(times))


def main():
    log(f"devices: {jax.devices()}")
    last_err = None
    for n in (int(os.environ.get("BENCH_N", "30")), 26, 22):
        for attempt in range(2):
            try:
                t = run(n)
                print(
                    json.dumps(
                        {
                            "metric": "zt_apply_scan4096_chi128_wall_s",
                            "value": round(t, 6),
                            "unit": "s",
                            "vs_baseline": round(BASELINE_S / t, 2),
                            "n": n,
                        }
                    )
                )
                return
            except Exception as e:  # transient tunnel error or OOM: retry
                last_err = e
                log(f"n={n} attempt {attempt}: {type(e).__name__}: {e}")
                time.sleep(20)
    raise SystemExit(f"bench failed at all sizes: {last_err}")


if __name__ == "__main__":
    main()
