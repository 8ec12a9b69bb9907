"""Accuracy/config sweep on the real TPU: err + warm stage times per config.

Runs the full flagship pipeline (encode -> build -> apply -> scan) at one
(n, cutoff, zip_mode, chi_work, final_sweeps) configuration per invocation
(subprocess-per-config keeps a relay crash from wedging the sweep driver).

Usage: python scripts/acc_sweep.py N CUTOFF ZIP_MODE CHI_WORK FINAL_SWEEPS
Prints one JSON line on stdout.
"""
from __future__ import annotations

import json
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

import numpy as np
import jax.numpy as jnp

from bench import CHI, DECAY, FREQ, WR, accuracy, scan_samples
from qilaplace_tpu import build_zt_mpo, generate_signal, signal_ztmps
from qilaplace_tpu.core.mps import coefficient_batch
from qilaplace_tpu.ops.apply import apply


def main():
    n = int(sys.argv[1])
    cutoff = float(sys.argv[2])
    zip_mode = sys.argv[3]
    chi_work = int(sys.argv[4])
    final_sweeps = int(sys.argv[5])

    tpu = jax.devices()[0]
    ks, ls, cfg_np = scan_samples(n)
    configs = jax.device_put(cfg_np, tpu)

    @jax.jit
    def step(W, psi, configs):
        out = apply(W, psi, maxdim=CHI, cutoff=cutoff,
                    final_sweeps=final_sweeps, chi_work=chi_work,
                    zip_mode=zip_mode)
        vals = coefficient_batch(out, configs)
        return jnp.real(vals), jnp.imag(vals)

    def run():
        x = generate_signal(n, kind="sin_decay", freq=FREQ, decay_rate=DECAY,
                            dtype=jnp.float32)
        t0 = time.perf_counter()
        psi = signal_ztmps(x, method="rsvd", k=50, p=5, q=2, cutoff=cutoff,
                           maxdim=CHI)
        np.asarray(psi.chain.ranks)
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        W = build_zt_mpo(n, WR, cutoff=cutoff, maxdim=CHI, chi=CHI,
                         dtype=np.complex64)
        np.asarray(W.chain.ranks)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        re, im = step(W, psi, configs)
        re_h, im_h = np.asarray(re), np.asarray(im)
        t_apply = time.perf_counter() - t0
        return psi, W, re_h, im_h, t_enc, t_build, t_apply

    t0 = time.perf_counter()
    run()  # warmup/compile
    t_warm = time.perf_counter() - t0
    print(f"warmup {t_warm:.1f}s", file=sys.stderr, flush=True)
    psi, W, re_h, im_h, t_enc, t_build, t_apply = run()
    err, peak = accuracy(n, re_h, im_h, ks, ls)
    out = {
        "n": n, "cutoff": cutoff, "zip_mode": zip_mode,
        "chi_work": chi_work, "final_sweeps": final_sweeps,
        "encode_s": round(t_enc, 3), "build_s": round(t_build, 3),
        "apply_scan_s": round(t_apply, 3),
        "err": float(f"{err:.4g}"), "peak": float(f"{peak:.4g}"),
        "mpo_bond": int(np.asarray(W.chain.ranks).max()),
        "psi_bond": int(np.asarray(psi.chain.ranks).max()),
        "warmup_s": round(t_warm, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
