"""Full zT pipeline runtime over structured signals.

Mirrors reference scripts/benchmark/zt_full_runtime.jl (published at m=60,
i.e. n=30: ~20 s encode+apply for :sin / :multi_sin_exp / :abs_cos_power_p8,
docs/src/benchmarking.md:307-309). Reports encode, apply and 4096-point scan
separately, plus max bond dims.

Usage: python scripts/benchmark/zt_full_runtime.py [n_max] [kinds...]
Env: ZT_BENCH_RANDOM_NS="18,22" re-runs just those n for kind=random
(reference docs/src/benchmarking.md:65-67).
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 3)[0])  # repo root for qilaplace_tpu

import numpy as np
import jax
import jax.numpy as jnp

from common import BenchmarkStore, TimeBudget, banner, timed

CHI = 128
CUTOFF = 1e-9
K, P, Q = 50, 5, 2
N_SCAN = 4096


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    kinds = sys.argv[2:] or ["sin", "multi_sin_exp", "abs_cos_power_p8"]
    from qilaplace_tpu import (
        apply,
        build_zt_mpo,
        generate_signal,
        signal_ztmps,
    )
    from qilaplace_tpu.core.mps import coefficient_batch
    from qilaplace_tpu.core.mpo import max_bond
    from qilaplace_tpu.utils.bits import paired_config_from_kl

    store = BenchmarkStore(
        "zt_full_runtime",
        {"chi": CHI, "cutoff": CUTOFF, "k": K, "p": P, "q": Q, "n_scan": N_SCAN},
    )
    wr = 2 * np.pi
    ns = list(range(10, n_max + 1, 2))
    random_ns = os.environ.get("ZT_BENCH_RANDOM_NS")
    if random_ns:
        kinds = ["random"]
        ns = [int(v) for v in random_ns.split(",")]

    for kind in kinds:
        series = store.series(kind, {})
        budget = TimeBudget(120.0)
        for n in ns:
            if budget.exceeded or series.has_point(n):
                continue
            banner(f"zt {kind} n={n}")
            total0 = time.perf_counter()
            x = generate_signal(
                n, kind=kind, freq=2 * np.pi if kind == "sin" else None,
                dtype=jnp.float32,
            )
            enc = jax.jit(
                lambda v: signal_ztmps(
                    v, method="rsvd", cutoff=CUTOFF, maxdim=CHI, chi=CHI,
                    k=K, p=P, q=Q
                ).chain.cores
            )
            t_enc, _ = timed(enc, x, warmup=1, repeats=1)
            psi = signal_ztmps(x, method="rsvd", cutoff=CUTOFF, maxdim=CHI,
                               chi=CHI, k=K, p=P, q=Q)
            t0 = time.perf_counter()
            W = build_zt_mpo(n, wr, cutoff=CUTOFF, maxdim=CHI, chi=CHI,
                             dtype=np.complex64)
            jax.block_until_ready(W.chain.cores)
            t_build = time.perf_counter() - t0

            rng = np.random.default_rng(0)
            cfg = paired_config_from_kl(
                jnp.asarray(rng.integers(0, 2**n, N_SCAN)),
                jnp.asarray(rng.integers(0, 2**n, N_SCAN)),
                n,
            )
            step = jax.jit(
                lambda W, p, c: jnp.abs(
                    coefficient_batch(
                        apply(W, p, maxdim=CHI, cutoff=CUTOFF), c
                    )
                ).astype(jnp.float32)
            )
            t_step, _ = timed(step, W, psi, cfg)
            series.add_point(
                n,
                {
                    "encode_seconds": t_enc,
                    "build_seconds": t_build,
                    "apply_plus_scan_seconds": t_step,
                    "total_seconds": time.perf_counter() - total0,
                    "mps_max_bond": int(jnp.max(psi.chain.ranks)),
                    "mpo_max_bond": int(max_bond(W)),
                },
            )
            budget.note(t_enc + t_step)
            print(
                f"  encode {t_enc:.2f}s build {t_build:.2f}s "
                f"apply+scan {t_step:.4f}s",
                file=sys.stderr,
            )
            store.save(series)


if __name__ == "__main__":
    main()
