"""Probe: does the tunneled TPU backend support f64 arithmetic?

The f32 pipeline floors at ~1e-2 relative-to-peak scan error (measured —
CPU/LAPACK f32 shows the same floor, so it is arithmetic, not the device
SVD; rounding f64-built artifacts to f32 is free). If the backend can run
f64 (even emulated/slow), the latency-bound build/encode stages can run in
f64 and the floor drops to the truncation level (~1e-4 at cutoff 1e-7).

Checks, each in its own jitted program with f32 fetches only:
  1. f64 constant + sum (basic arithmetic)
  2. f64 matmul precision: is the result better than f32 matmul?
  3. f64 transfer: can we device_put / fetch f64? (expected: maybe not)
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)


def run(tag, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"{tag}: OK {out} ({time.time()-t0:.2f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:200]
        print(f"{tag}: FAIL {type(e).__name__}: {msg} ({time.time()-t0:.2f}s)",
              flush=True)
        return False


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # 1. basic f64 arithmetic inside jit, fetched as f32
    def basic():
        @jax.jit
        def f():
            x = jnp.arange(7, dtype=jnp.float64)
            s = jnp.sum(x * x) + jnp.float64(1e-9)
            return s.astype(jnp.float32)
        return float(f())
    ok = run("f64 jit arithmetic", basic)

    # 2. f64 matmul precision vs f32: condition a product to expose eps
    def matmul_prec():
        @jax.jit
        def f():
            k = jnp.arange(512, dtype=jnp.float64)
            a = 1.0 + k[None, :] * 1e-12  # [1, 512]
            b = jnp.ones((512, 1), dtype=jnp.float64)
            exact = 512.0 + jnp.sum(k) * 1e-12
            got64 = (a @ b)[0, 0]
            got32 = (a.astype(jnp.float32) @ b.astype(jnp.float32))[0, 0]
            return jnp.stack([
                (jnp.abs(got64 - exact) / exact).astype(jnp.float32),
                (jnp.abs(got32.astype(jnp.float64) - exact) / exact
                 ).astype(jnp.float32),
            ])
        r = np.asarray(f())
        return f"rel_err f64={r[0]:.3e} f32={r[1]:.3e}"
    run("f64 matmul precision", matmul_prec)

    # 3. f64 matmul wall-clock at build-relevant shape (warm, fetch-synced)
    def matmul_speed():
        @jax.jit
        def f(x):
            y = x
            for _ in range(8):
                y = y @ x
            return jnp.sum(y).astype(jnp.float32)
        x64 = jnp.eye(256, dtype=jnp.float64) * 0.99
        float(f(x64))  # compile
        t0 = time.time()
        float(f(x64))
        t64 = time.time() - t0

        @jax.jit
        def g(x):
            y = x
            for _ in range(8):
                y = y @ x
            return jnp.sum(y).astype(jnp.float32)
        x32 = jnp.eye(256, dtype=jnp.float32) * 0.99
        float(g(x32))
        t0 = time.time()
        float(g(x32))
        t32 = time.time() - t0
        return f"8x [256,256] matmul: f64 {t64*1e3:.1f}ms f32 {t32*1e3:.1f}ms"
    if ok:
        run("f64 matmul speed", matmul_speed)

    # 4. f64 host->device transfer (the known-fragile direction)
    def xfer():
        x = jax.device_put(np.ones(8, dtype=np.float64), dev)
        s = jax.jit(lambda v: jnp.sum(v).astype(jnp.float32))(x)
        return float(s)
    run("f64 device_put", xfer)

    # 5. f64 fetch (expected fragile: fetch f32 instead in production)
    def fetch():
        y = jax.jit(lambda: jnp.ones(4, dtype=jnp.float64))()
        return np.asarray(y).sum()
    run("f64 fetch", fetch)


if __name__ == "__main__":
    sys.exit(main())
