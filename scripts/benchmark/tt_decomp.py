"""Full signal_mps encode sweep: :svd vs :rsvd.

Mirrors reference scripts/benchmark/tt_decomp.jl (published: 19.67 s svd vs
0.37 s rsvd at n=24 on a random signal, docs/src/benchmarking.md:162-166).

Usage: python scripts/benchmark/tt_decomp.py [n_max]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 3)[0])  # repo root for qilaplace_tpu

import jax
import jax.numpy as jnp
import numpy as np

from common import BenchmarkStore, TimeBudget, banner, timed

K, P, Q = 50, 5, 2
CUTOFF = 1e-9
MAXDIM = 128


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    from qilaplace_tpu import generate_signal, signal_mps
    from qilaplace_tpu.core.mps import norm as mps_norm

    store = BenchmarkStore(
        "tt_decomp", {"k": K, "p": P, "q": Q, "cutoff": CUTOFF, "maxdim": MAXDIM}
    )
    s_svd = store.series("svd", {"cutoff": CUTOFF, "maxdim": MAXDIM})
    s_rsvd = store.series("rsvd", {"k": K, "p": P, "q": Q})
    budgets = {"svd": TimeBudget(60.0), "rsvd": TimeBudget(60.0)}

    for n in range(10, n_max + 1, 2):
        x = generate_signal(n, kind="random", dtype=jnp.float32)
        banner(f"n={n}: N={2**n}")
        for name, series in (("svd", s_svd), ("rsvd", s_rsvd)):
            if budgets[name].exceeded or series.has_point(n):
                continue
            fn = jax.jit(
                lambda v, m=name: signal_mps(
                    v, method=m, cutoff=CUTOFF, maxdim=MAXDIM, k=K, p=P, q=Q
                ).cores
            )
            try:
                t, _ = timed(fn, x)
                psi = signal_mps(x, method=name, cutoff=CUTOFF, maxdim=MAXDIM,
                                 k=K, p=P, q=Q)
                series.add_point(
                    n,
                    {
                        "seconds": t,
                        "max_bond": int(jnp.max(psi.ranks)),
                    },
                )
                budgets[name].note(t)
                print(f"  {name} {t:.3f}s", file=sys.stderr)
            except Exception as e:
                print(f"  {name} failed: {e}", file=sys.stderr)
                budgets[name].exceeded = True
        store.save(s_svd, s_rsvd)


if __name__ == "__main__":
    main()
