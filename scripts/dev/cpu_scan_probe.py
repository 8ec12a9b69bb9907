"""Probe: CPU-fallback scan-route shootout at n=30.

The bench's "cpu" mode (TPU relay down) currently runs the direct
<config|W|psi> zipper readout in complex64 — 290 GFLOP through one host
core, ~7.9 s. Candidates measured here:

  direct-c64      current default (apply_coefficient_batch, f32 pipeline)
  apply+read c128 fused range-zip apply once (shared across configs), tighten,
                  then coefficient_batch — f64 end to end (native on CPU)
  apply+read c64  same route in f32 (accuracy expected to floor ~1e-2)

Usage: python scripts/dev/cpu_scan_probe.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench
from qilaplace_tpu import signal_ztmps, tighten
from qilaplace_tpu.core.mps import coefficient_batch
from qilaplace_tpu.ops.apply import apply, apply_coefficient_batch
from qilaplace_tpu.transforms.zt import zt_mpo

n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
WR = bench.WR
ks, ls, cfg_np = bench.scan_samples(n)
configs = jnp.asarray(cfg_np)
x = bench.signal_fn(n)

psi = tighten(signal_ztmps(x, method="cross", cutoff=1e-12, maxdim=128))
W = tighten(zt_mpo(n, WR, engine="analytic", cutoff=1e-12, maxdim=128,
                   dtype=np.complex128, cache=False))
print(f"n={n} W bond {int(np.asarray(W.chain.ranks).max())} "
      f"(bucket {W.chain.chi}), psi rank {int(np.asarray(psi.chain.ranks).max())} "
      f"(bucket {psi.chain.chi})", flush=True)


def cast(state, dt):
    from qilaplace_tpu.core.mps import MPS, ZTMPS
    from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO

    ch = state.chain
    amp = getattr(ch, "amplitude", None)
    if isinstance(state, (MPO, PairedSiteMPO)):
        return type(state)(chain=MPO(cores=ch.cores.astype(dt), ranks=ch.ranks))
    return type(state)(chain=MPS(cores=ch.cores.astype(dt), ranks=ch.ranks,
                                 amplitude=amp.real.astype(jnp.float64 if dt == jnp.complex128 else jnp.float32)))


def timeit(f, *a):
    out = f(*a)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*a)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return out, float(np.median(ts))


def report(tag, vals, t, extra=""):
    err, peak = bench.accuracy(n, np.real(np.asarray(vals)),
                               np.imag(np.asarray(vals)), ks, ls)
    print(f"{tag:24s} {t:7.3f}s  err_rel_peak {err:.3e} {extra}", flush=True)


# --- A: direct readout, c64 (the current cpu-mode step) ---
W32, psi32 = cast(W, jnp.complex64), cast(psi, jnp.complex64)
step_direct = jax.jit(apply_coefficient_batch)
vals, t = timeit(step_direct, W32, psi32, configs)
report("direct c64", vals, t)

# --- B: apply (range zip) + tighten + batched read, c128 ---
for dt, tag in ((jnp.complex128, "apply+read c128"), (jnp.complex64, "apply+read c64")):
    Wd, pd = cast(W, dt), cast(psi, dt)

    @jax.jit
    def step_apply(W_, p_, cfg):
        out = apply(W_, p_, maxdim=128, cutoff=1e-9, final_sweeps=0,
                    zip_mode="range")
        return coefficient_batch(out, cfg)

    vals, t = timeit(step_apply, Wd, pd, configs)
    out = apply(Wd, pd, maxdim=128, cutoff=1e-9, final_sweeps=0,
                zip_mode="range")
    r_out = int(np.asarray(out.chain.ranks).max())
    report(tag, vals, t, f"(out rank {r_out})")

    # tightened variant: apply once at 128, repad output to its rank bucket,
    # read at the tight bucket
    out_t = tighten(out)

    @jax.jit
    def step_read(o_, cfg):
        return coefficient_batch(o_, cfg)

    vals2, t_read = timeit(step_read, out_t, configs)
    _, t_apply = timeit(
        jax.jit(lambda W_, p_: apply(W_, p_, maxdim=128, cutoff=1e-9,
                                     final_sweeps=0, zip_mode="range").chain.cores),
        Wd, pd)
    report(f"  split {tag}", vals2, t_read + t_apply,
           f"(apply {t_apply:.3f} + read {t_read:.3f} @bucket {out_t.chain.chi})")
