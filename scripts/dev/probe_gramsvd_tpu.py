"""Singular-value accuracy / truncation-error of _gram_svd variants on TPU.

Graded spectrum 1..1e-8 (f64-constructed, shipped f32). For [m, b] in
{(160, 1024), (320, 1024)} and each variant, measures:
  srel@1e-2 / @1e-4 / @1e-6 — max rel error of s in each decade band
  trunc(c)  — reconstruction error truncating at relative-squared cutoff c
              vs the ideal tail at that cutoff's rank
  t_ms      — per-call wall time (median of 5 fetch-synced batches of 4)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from qilaplace_tpu.ops.jacobi import default_sweeps, fast_sweeps
from qilaplace_tpu.ops.truncation import _gram_svd


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_M(m, b, seed):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    U, _ = np.linalg.qr(A)
    A = rng.normal(size=(b, m)) + 1j * rng.normal(size=(b, m))
    V, _ = np.linalg.qr(A)
    s = np.logspace(0.0, -8.0, m)
    M = (U * s) @ V.conj().T
    return (M.real.astype(np.float32), M.imag.astype(np.float32), s)


for (m, b) in ((160, 1024), (320, 1024)):
    Mr, Mi, s_true = make_M(m, b, 3)
    variants = [
        ("fast/p4", fast_sweeps(m), 4, 0),
        ("def/p4", default_sweeps(m), 4, 0),
        ("fast/p6", fast_sweeps(m), 6, 0),
        ("fast/p6/os2", fast_sweeps(m), 6, 2),
        ("fast/p0/os3", fast_sweeps(m), 0, 3),
    ]
    for name, sw, pol, oss in variants:
        @jax.jit
        def probe(Mr, Mi, sw=sw, pol=pol, oss=oss):
            M = Mr + 1j * Mi
            U, s, Vh = _gram_svd(M, sweeps=sw, polish=pol, os_sweeps=oss)
            nrm = jnp.linalg.norm(M).real
            outs = []
            for c in (1e-7, 1e-9, 1e-11):
                # rank under the relative-squared rule on TRUE s (ideal)
                p = jnp.asarray(s_true * s_true, jnp.float32)
                tail = jnp.cumsum(p[::-1])[::-1]
                ok = jnp.concatenate([tail[1:], jnp.zeros((1,), jnp.float32)]) \
                    <= c * tail[0]
                r = jnp.argmax(ok) + 1
                keep = (jnp.arange(s.shape[0]) < r)[None, :]
                Mtr = ((U * jnp.where(keep[0], s, 0.0)[None, :].astype(M.dtype))
                       @ Vh)
                outs.append(jnp.linalg.norm(Mtr - M).real / nrm)
            return s.astype(jnp.float32), outs[0], outs[1], outs[2]

        # timing: batch of 4 vmapped, median of 5
        probe(Mr, Mi)  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = probe(Mr, Mi)
            np.asarray(out[1])
            ts.append(time.perf_counter() - t0)
        s_dev, e7, e9, e11 = (np.asarray(x, np.float64) for x in probe(Mr, Mi))
        rel = np.abs(s_dev - s_true) / s_true
        band = lambda lo, hi: rel[(s_true <= hi) & (s_true > lo)].max()
        # ideal tails for reference
        def ideal(c):
            p = s_true * s_true
            tail = np.concatenate([np.cumsum(p[::-1])[::-1][1:], [0.0]])
            r = int(np.argmax(tail <= c * p.sum()) + 1)
            return np.sqrt(p[r:].sum()) / np.sqrt(p.sum())
        log(f"[{m},{b}] {name:12s}: srel@1e-2 {band(3e-3, 3e-2):.2e} "
            f"@1e-4 {band(3e-5, 3e-4):.2e} @1e-6 {band(3e-7, 3e-6):.2e} | "
            f"trunc 1e-7 {float(e7):.2e}/{ideal(1e-7):.2e} "
            f"1e-9 {float(e9):.2e}/{ideal(1e-9):.2e} "
            f"1e-11 {float(e11):.2e}/{ideal(1e-11):.2e} | "
            f"{1000*np.median(ts):.0f} ms")
