"""Headline benchmark: zT apply (fused, chi=128) + 4096-point pole scan.

Driver target (BASELINE.json): n=30, chi=128 zT apply + 4096-point pole scan
< 1 s on one TPU chip. Closest published reference number: zT end-to-end
(signal_ztmps + apply) at m=60 (n=30) = 20.036 s on an M2 Max
(reference docs/src/benchmarking.md:307; BASELINE.md row 12). vs_baseline
reports the speedup 20.036 / value.

The timed region is the jitted device program: fused MPO-MPS apply at
maxdim=128 plus a 4096-configuration coefficient scan. Encode and MPO build
are one-time setup (reported to stderr, not part of the metric).

Prints exactly ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_S = 20.036
CHI = 128
N_SCAN = 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(n: int) -> float:
    from qilaplace_tpu import build_zt_mpo, generate_signal, signal_ztmps
    from qilaplace_tpu.core.mps import coefficient_batch
    from qilaplace_tpu.core.mpo import max_bond
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
    psi.chain.cores.block_until_ready()
    log(
        f"encode (rsvd) in {time.perf_counter() - t0:.2f}s, "
        f"max bond {int(jnp.max(psi.chain.ranks))}"
    )

    t0 = time.perf_counter()
    W = build_zt_mpo(n, 2 * np.pi, cutoff=1e-7, maxdim=CHI, chi=CHI,
                     dtype=np.complex64)
    W.chain.cores.block_until_ready()
    log(
        f"zT MPO built in {time.perf_counter() - t0:.2f}s, "
        f"max bond {int(max_bond(W))}"
    )

    rng = np.random.default_rng(0)
    side = int(np.sqrt(N_SCAN))
    ks = jnp.asarray(rng.integers(0, 2**n, size=N_SCAN))
    ls = jnp.asarray(rng.integers(0, 2**n, size=N_SCAN))
    configs = paired_config_from_kl(ks, ls, n)

    @jax.jit
    def step(W, psi, configs):
        out = apply(W, psi, maxdim=CHI, cutoff=1e-9)
        return coefficient_batch(out, configs)

    t0 = time.perf_counter()
    step(W, psi, configs).block_until_ready()
    log(f"compile+first run {time.perf_counter() - t0:.2f}s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        step(W, psi, configs).block_until_ready()
        times.append(time.perf_counter() - t0)
    log(f"runs: {['%.4f' % t for t in times]}")
    return float(np.median(times))


def main():
    log(f"devices: {jax.devices()}")
    for n in (int(os.environ.get("BENCH_N", "30")), 26, 22):
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
        except Exception as e:  # OOM or backend failure: retry smaller
            log(f"n={n} failed: {type(e).__name__}: {e}")
    raise SystemExit("bench failed at all sizes")


if __name__ == "__main__":
    main()
