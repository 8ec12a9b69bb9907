"""Minimal TPU probe: direct (factored XLA) vs fused (Kron + Pallas) scan
readout at n=30 — one setup, two timed steps, least possible relay load.

Usage: python scripts/dev/fused_readout_probe.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench
from qilaplace_tpu import signal_ztmps, tighten
from qilaplace_tpu.ops.apply import apply_coefficient_batch, zipper_chain
from qilaplace_tpu.ops.pallas_kernels import coefficient_batch_pallas
from qilaplace_tpu.transforms.analytic import zt_product_pack
from qilaplace_tpu.utils.io import ship_state_and_pack

n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
cpu = jax.local_devices(backend="cpu")[0]
tpu = jax.devices()[0]
ks, ls, cfg = bench.scan_samples(n)
configs = jax.device_put(cfg, tpu)
with jax.default_device(cpu):
    psi = tighten(signal_ztmps(bench.signal_fn(n), method="cross",
                               cutoff=1e-12, maxdim=128))
    pack = zt_product_pack(n, bench.WR, cutoff=1e-12, maxdim=128)
psi_d, W_d = ship_state_and_pack(psi, pack, tpu, state_dtype=jnp.float32,
                                 mpo_dtype=jnp.complex64)


@jax.jit
def step_direct(W, p, c):
    v = apply_coefficient_batch(W, p, c)
    return jnp.real(v), jnp.imag(v)


@jax.jit
def step_fused(W, p, c):
    v = coefficient_batch_pallas(zipper_chain(W, p), c)
    return jnp.real(v), jnp.imag(v)


def run(step, label):
    r, i = step(W_d, psi_d, configs)
    np.asarray(r)  # fetch-sync
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r, i = step(W_d, psi_d, configs)
        rh, ih = np.asarray(r), np.asarray(i)
        ts.append(time.perf_counter() - t0)
    err, _ = bench.accuracy(n, rh, ih, ks, ls)
    print(f"{label}: median {np.median(ts)*1e3:.1f} ms  min {min(ts)*1e3:.1f} ms"
          f"  err {err:.3e}", flush=True)


print(f"chi_eff = {W_d.chain.chi * psi_d.chain.chi}", flush=True)
run(step_direct, "direct (factored XLA) ")
run(step_fused, "fused (Kron + Pallas) ")
