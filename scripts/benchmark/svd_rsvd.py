"""Single middle-bipartition SVD vs RSVD sweep.

Mirrors reference scripts/benchmark/svd_rsvd_itensor.jl (published numbers:
11.09 s SVD vs 0.224 s RSVD at n=24 on M2 Max,
docs/src/benchmarking.md:128-132). Random (2,...,2) tensor, one split at the
middle bond.

Usage: python scripts/benchmark/svd_rsvd.py [n_max]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 3)[0])  # repo root for qilaplace_tpu

import numpy as np
import jax
import jax.numpy as jnp

from common import BenchmarkStore, TimeBudget, banner, timed

K, P, Q = 100, 5, 2
N_MIN = 10


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    from qilaplace_tpu.ops.rsvd import rsvd
    from qilaplace_tpu.ops.truncation import truncated_svd

    store = BenchmarkStore("svd_rsvd", {"k": K, "p": P, "q": Q})
    s_svd = store.series("svd", {})
    s_rsvd = store.series("rsvd", {"k": K, "p": P, "q": Q})
    budget_svd, budget_rsvd = TimeBudget(30.0), TimeBudget(30.0)

    svd_fn = jax.jit(lambda M: truncated_svd(M, cutoff=1e-15)[1])
    rsvd_fn = jax.jit(
        lambda M, key: rsvd(M, key, k=K, p=P, q=Q, cutoff=1e-15)[1]
    )

    for n in range(N_MIN, n_max + 1, 2):
        a = 2 ** (n // 2)
        x = jax.random.normal(jax.random.PRNGKey(n), (a, 2 ** (n - n // 2)),
                              dtype=jnp.float32)
        banner(f"n={n}: bipartition {x.shape}")
        if not budget_svd.exceeded and not s_svd.has_point(n):
            try:
                t, _ = timed(svd_fn, x)
                s_svd.add_point(n, {"seconds": t})
                budget_svd.note(t)
                print(f"  svd  {t:.3f}s", file=sys.stderr)
            except Exception as e:
                print(f"  svd failed: {e}", file=sys.stderr)
                budget_svd.exceeded = True
        if not budget_rsvd.exceeded and not s_rsvd.has_point(n):
            t, _ = timed(rsvd_fn, x, jax.random.PRNGKey(0))
            s_rsvd.add_point(n, {"seconds": t})
            budget_rsvd.note(t)
            print(f"  rsvd {t:.3f}s", file=sys.stderr)
        store.save(s_svd, s_rsvd)


if __name__ == "__main__":
    main()
