"""MPO bond-dimension plateaus for QFT / DT / zT builds.

Mirrors reference scripts/benchmark/mpo_bond_dim.jl (published plateaus at
cutoff 1e-15: QFT D_max = 8, DT ~17-18, zT ~89-92,
docs/src/benchmarking.md:211-219).

Usage: python scripts/benchmark/mpo_bond_dim.py [n_max]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 3)[0])  # repo root for qilaplace_tpu

import numpy as np

from common import BenchmarkStore, banner

# plateau structure is a precision-sensitive property: measure in f64/c128
import jax

jax.config.update("jax_enable_x64", True)

CUTOFF = 1e-15


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    import jax.numpy as jnp
    from qilaplace_tpu import build_dt_mpo, build_qft_mpo, build_zt_mpo
    from qilaplace_tpu.core.mpo import max_bond

    store = BenchmarkStore("mpo_bond_dim", {"cutoff": CUTOFF})
    series = {
        "qft": store.series("qft", {}),
        "dt": store.series("dt", {}),
        "zt": store.series("zt", {}),
    }
    wr = 2 * np.pi
    for n in range(2, n_max + 1):
        banner(f"n={n}")
        for name, build in (
            ("qft", lambda: build_qft_mpo(n, cutoff=CUTOFF)),
            ("dt", lambda: build_dt_mpo(n, wr, cutoff=CUTOFF)),
            ("zt", lambda: build_zt_mpo(n, wr, cutoff=CUTOFF)),
        ):
            if series[name].has_point(n):
                continue
            t0 = time.perf_counter()
            W = build()
            mb = int(max_bond(W))
            series[name].add_point(
                n, {"max_bond": mb, "build_seconds": time.perf_counter() - t0}
            )
            print(f"  {name}: D_max={mb}", file=sys.stderr)
        store.save(*series.values())


if __name__ == "__main__":
    main()
