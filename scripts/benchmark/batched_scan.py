"""Batched / multi-operator pole scans on the real TPU.

The single flagship scan (4096 points, n=30) keeps the chip busy for
~0.1 s at single-digit MFU — latency-bound, not MXU-bound. This runner
measures the two batching axes that fill the idle capacity (round-3
verdict #4; no reference counterpart — the reference is single-threaded):

* multi-wr: W_OPS operators evaluated over the same 4096-point grid in ONE
  vmapped device program (qilaplace_tpu.parallel.multi_mpo_chi_batch);
* big-grid: one operator over a 2^16-point grid.

Reports per-scan / per-point costs next to the single-scan baseline and
the flops-model MFU for each shape. Artifact:
scripts/benchmark/results/batched_scan.json.

Usage: python scripts/benchmark/batched_scan.py [n] [w_ops]
Env: QILAPLACE_PLATFORM=cpu to force CPU (honest but slow).
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 3)[0])

import numpy as np

if os.environ.get("QILAPLACE_PLATFORM") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
import jax
import jax.numpy as jnp

from common import BenchmarkStore, banner

CHI = 128
W_CUTOFF = 1e-12
PSI_CUTOFF = 1e-12
N_SCAN = 4096
BIG_GRID = 65536
PEAK_F32_FLOPS = 49.2e12  # v5e MXU f32 estimate (bf16 197 TF / 4)


def scan_configs(n, count, seed=0):
    rng = np.random.default_rng(seed)
    N = 2**n
    ks = rng.integers(0, N, count)
    ls = rng.integers(0, N, count)
    kb = ((ks[:, None] >> np.arange(n)) & 1).astype(np.int32)
    lb = ((ls[:, None] >> np.arange(n)) & 1).astype(np.int32)
    return np.stack([kb, lb], axis=2).reshape(count, 2 * n)


def zipper_flops(n, cw, cp, B, n_ops=1):
    return n_ops * 2 * n * 2 * 2 * B * cw * cp * (cw + cp) * 8


def fetch_timed(fn, repeats=3):
    """Median wall of fn() with a FETCH sync (block_until_ready does not
    block on the tunneled backend)."""
    out = fn()
    np.asarray(out[0] if isinstance(out, tuple) else out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0] if isinstance(out, tuple) else out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    w_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from qilaplace_tpu import signal_ztmps, tighten
    from qilaplace_tpu.ops.apply import apply_coefficient_batch
    from qilaplace_tpu.parallel.mesh import _multi_direct, stack_mpos
    from qilaplace_tpu.transforms.analytic import (
        zt_mpo_from_pack,
        zt_product_pack,
    )
    from qilaplace_tpu.utils.io import ship

    cpu = jax.local_devices(backend="cpu")[0]
    dev = jax.devices()[0]
    banner(f"batched scans: n={n}, chi={CHI}, device={dev}")

    N = 2**n
    dt = 1.0 / (2.0 * N)

    def f(j):
        j = j.astype(np.float64)
        return np.sin(2.0 * dt * j) * np.exp(-0.5 * dt * j)

    f.n_bits = n

    with jax.default_device(cpu):
        psi = tighten(signal_ztmps(f, method="cross", cutoff=PSI_CUTOFF,
                                   maxdim=CHI))
        packs = [
            zt_product_pack(n, 2 * np.pi * (1 + i / w_ops),
                            cutoff=W_CUTOFF, maxdim=CHI)
            for i in range(w_ops)
        ]
    psi_dev = ship(psi, dev, dtype=jnp.float32)
    Ws = [zt_mpo_from_pack(p, device=dev, dtype=jnp.complex64)
          for p in packs]
    stacked = stack_mpos(Ws)
    cw = int(Ws[0].chain.chi)
    cp = int(psi_dev.chain.chi)

    read_one = jax.jit(
        lambda W, s, c: jnp.abs(apply_coefficient_batch(W, s, c))
    )
    read_multi = jax.jit(
        lambda Ws_, s, c: jnp.abs(_multi_direct(Ws_, s, c))
    )

    cfg = jax.device_put(scan_configs(n, N_SCAN), dev)
    cfg_big = jax.device_put(scan_configs(n, BIG_GRID, seed=1), dev)

    t_single = fetch_timed(lambda: read_one(Ws[0], psi_dev, cfg))
    t_multi = fetch_timed(lambda: read_multi(stacked, psi_dev, cfg))
    t_big = fetch_timed(lambda: read_one(Ws[0], psi_dev, cfg_big))

    def row(label, t, B, ops):
        fl = zipper_flops(n, cw, cp, B, ops)
        return {
            "label": label, "wall_s": round(t, 6), "n_ops": ops,
            "points": B, "per_scan_s": round(t / ops, 6),
            "per_point_us": round(1e6 * t / (ops * B), 3),
            "gflops": round(fl / 1e9, 1),
            "mfu_est": round(fl / t / PEAK_F32_FLOPS, 4),
        }

    rows = [
        row("single_4096", t_single, N_SCAN, 1),
        row(f"multi_wr_{w_ops}x4096", t_multi, N_SCAN, w_ops),
        row("big_grid_65536", t_big, BIG_GRID, 1),
    ]
    for r in rows:
        print(f"{r['label']:>20}: {r['wall_s']*1e3:8.1f} ms | per-scan "
              f"{r['per_scan_s']*1e3:7.1f} ms | per-point "
              f"{r['per_point_us']:6.2f} us | MFU~{r['mfu_est']:.3f}",
              file=sys.stderr)

    store = BenchmarkStore(
        "batched_scan",
        {"n": n, "chi": CHI, "w_ops": w_ops, "n_scan": N_SCAN,
         "big_grid": BIG_GRID, "cw": cw, "cp": cp,
         "device": str(dev)},
    )
    s = store.series("batched_scan", {"n": n})
    for r in rows:
        s.add_point(r["label"], r)
    store.save(s)
    print(f"saved {store.path}", file=sys.stderr)


if __name__ == "__main__":
    main()
