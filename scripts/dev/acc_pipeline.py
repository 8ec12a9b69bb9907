"""End-to-end accuracy check of the device-linalg path: the flagship zT
pipeline (encode -> build -> fused apply -> batched readout) vs the
closed-form sin_decay oracle, at several n and cutoffs. With the
graded-Gram refinement the error must improve (or hold) as the cutoff
tightens.

Runs on the real TPU by default (fast); QILAPLACE_PLATFORM=cpu forces the
hermetic CPU run with FORCE_DEVICE_PATH (slow — same numerics, no backend).
Tunneled-backend rules: complex never crosses host<->device; fetches are
f32 (bench.py conventions).

Usage: python scripts/acc_pipeline.py [n ...]   (default 10 14)
       QILAPLACE_CUTOFFS=1e-7,1e-9 to override the cutoff sweep
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("QILAPLACE_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import qilaplace_tpu.ops.complexlinalg as cl

if jax.default_backend() == "cpu":
    cl.FORCE_DEVICE_PATH = True

from qilaplace_tpu import build_zt_mpo, generate_signal, signal_ztmps
from qilaplace_tpu.core.mps import coefficient_batch
from qilaplace_tpu.ops.apply import apply
from qilaplace_tpu.signals.oracles import sin_decay_norm, sin_decay_zt_oracle

WR = 2 * np.pi
FREQ, DECAY = 2.0, 0.5
CHI = 128


def run(n, cutoff):
    @jax.jit
    def step(W, psi, configs):
        out = apply(W, psi, maxdim=CHI, cutoff=cutoff, final_sweeps=0)
        vals = coefficient_batch(out, configs)
        return jnp.real(vals), jnp.imag(vals)

    x = generate_signal(n, kind="sin_decay", freq=FREQ, decay_rate=DECAY,
                        dtype=jnp.float32)
    t0 = time.perf_counter()
    psi = signal_ztmps(x, method="rsvd", k=50, p=5, q=2, cutoff=cutoff,
                       maxdim=CHI)
    np.asarray(psi.chain.ranks)
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    W = build_zt_mpo(n, WR, cutoff=cutoff, maxdim=CHI, chi=CHI,
                     dtype=np.complex64, chi_work=CHI)
    np.asarray(W.chain.ranks)
    t_build = time.perf_counter() - t0

    N = 2**n
    rng = np.random.default_rng(0)
    B = 2048
    ks = rng.integers(0, min(256, N), B)
    ls = rng.integers(0, min(8192, N), B) % N
    kb = ((ks[:, None] >> np.arange(n)) & 1).astype(np.int32)
    lb = ((ls[:, None] >> np.arange(n)) & 1).astype(np.int32)
    cfg = np.stack([kb, lb], axis=2).reshape(B, 2 * n)
    t0 = time.perf_counter()
    re, im = step(W, psi, jnp.asarray(cfg))
    got = np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)
    t_apply = time.perf_counter() - t0
    got = got / sin_decay_norm(n, freq=FREQ, decay_rate=DECAY)
    want = sin_decay_zt_oracle(n, ks, ls, wr=WR, freq=FREQ, decay_rate=DECAY)
    peak = np.abs(want).max()
    err = np.abs(got - want).max() / peak
    mpo_bond = int(np.asarray(W.chain.ranks).max())
    print(f"n={n:3d} cutoff={cutoff:g}  max_err_rel_peak {err:9.3e}  "
          f"mpo_bond {mpo_bond}  enc {t_enc:.2f}s build {t_build:.2f}s "
          f"apply+scan(1st) {t_apply:.2f}s", flush=True)
    return err


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [10, 14]
    cutoffs = [float(c) for c in
               os.environ.get("QILAPLACE_CUTOFFS", "1e-7,1e-9").split(",")]
    for n in ns:
        for cutoff in cutoffs:
            run(n, cutoff)
