"""Bisect the TPU-pipeline accuracy at n=10: run each stage (encode, build,
apply) on the device with the other stages pinned to host CPU LAPACK, and
report max_err_rel_peak for each combination against the closed-form
oracle. CPU stages use the native (linear-accuracy) path via the
jax_default_device pin that ops.complexlinalg honors.

Usage: python scripts/bisect_err.py [n] [cutoff]
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

import jax.numpy as jnp
import numpy as np

from qilaplace_tpu import build_zt_mpo, generate_signal, signal_ztmps
from qilaplace_tpu.core.mps import MPS, ZTMPS, coefficient_batch
from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO
from qilaplace_tpu.ops.apply import apply
from qilaplace_tpu.signals.oracles import sin_decay_norm, sin_decay_zt_oracle

WR = 2 * np.pi
FREQ, DECAY = 2.0, 0.5
CHI = 128

n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
cutoff = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-7

cpu = jax.local_devices(backend="cpu")[0]
tpu = jax.devices()[0]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def on_cpu(fn):
    jax.config.update("jax_default_device", cpu)
    try:
        out = fn()
        host = jax.tree_util.tree_map(
            lambda a: (np.asarray(jnp.real(a), np.float32),
                       np.asarray(jnp.imag(a), np.float32))
            if jnp.issubdtype(a.dtype, jnp.complexfloating)
            else np.asarray(a),
            out,
        )
    finally:
        jax.config.update("jax_default_device", None)
    return host


combine = jax.jit(lambda re, im: jax.lax.complex(re, im))


def ship(host):
    return jax.tree_util.tree_map(
        lambda a: combine(jax.device_put(a[0], tpu), jax.device_put(a[1], tpu))
        if isinstance(a, tuple)
        else jax.device_put(a, tpu),
        host,
        is_leaf=lambda a: isinstance(a, tuple),
    )


def scan_err(out):
    N = 2**n
    rng = np.random.default_rng(0)
    B = 1024
    ks = rng.integers(0, min(256, N), B)
    ls = rng.integers(0, min(8192, N), B) % N
    kb = ((ks[:, None] >> np.arange(n)) & 1).astype(np.int32)
    lb = ((ls[:, None] >> np.arange(n)) & 1).astype(np.int32)
    cfg = jnp.asarray(np.stack([kb, lb], axis=2).reshape(B, 2 * n))

    @jax.jit
    def read(out, cfg):
        v = coefficient_batch(out, cfg)
        return jnp.real(v), jnp.imag(v)

    re, im = read(out, cfg)
    got = np.asarray(re, np.float64) + 1j * np.asarray(im, np.float64)
    got = got / sin_decay_norm(n, freq=FREQ, decay_rate=DECAY)
    want = sin_decay_zt_oracle(n, ks, ls, wr=WR, freq=FREQ, decay_rate=DECAY)
    return float(np.abs(got - want).max() / np.abs(want).max())


def enc():
    x = generate_signal(n, kind="sin_decay", freq=FREQ, decay_rate=DECAY,
                        dtype=jnp.float32)
    return signal_ztmps(x, method="rsvd", k=50, p=5, q=2, cutoff=cutoff,
                        maxdim=CHI)


def build():
    return build_zt_mpo(n, WR, cutoff=cutoff, maxdim=CHI, chi=CHI,
                        dtype=np.complex64, chi_work=CHI)


def do_apply(W, psi, mode):
    return jax.jit(
        lambda W, psi: apply(W, psi, maxdim=CHI, cutoff=cutoff,
                             final_sweeps=0, zip_mode=mode)
    )(W, psi)


# host references (CPU LAPACK, f32)
psi_h = on_cpu(enc)
W_h = on_cpu(build)
psi_cpu = ship(psi_h)
W_cpu = ship(W_h)

# all-CPU reference (apply on CPU too), shipped for readout
def cpu_all():
    p = signal_ztmps(
        generate_signal(n, kind="sin_decay", freq=FREQ, decay_rate=DECAY,
                        dtype=jnp.float32),
        method="rsvd", k=50, p=5, q=2, cutoff=cutoff, maxdim=CHI)
    W = build_zt_mpo(n, WR, cutoff=cutoff, maxdim=CHI, chi=CHI,
                     dtype=np.complex64, chi_work=CHI)
    return apply(W, p, maxdim=CHI, cutoff=cutoff, final_sweeps=0)

out_h = on_cpu(cpu_all)
log(f"all-CPU reference            err {scan_err(ship(out_h)):.3e}")

for name, psi_use, W_use, mode in [
    ("apply TPU (svd zip)",  psi_cpu, W_cpu, "svd"),
    ("apply TPU (range zip)", psi_cpu, W_cpu, "range"),
]:
    t0 = time.perf_counter()
    e = scan_err(do_apply(W_use, psi_use, mode))
    log(f"{name:28s} err {e:.3e}  ({time.perf_counter()-t0:.1f}s)")

t0 = time.perf_counter()
psi_t = enc()
e = scan_err(do_apply(W_cpu, psi_t, "svd"))
log(f"{'encode TPU':28s} err {e:.3e}  ({time.perf_counter()-t0:.1f}s)")

t0 = time.perf_counter()
W_t = build()
mb = int(np.asarray(W_t.chain.ranks).max())
e = scan_err(do_apply(W_t, psi_cpu, "svd"))
log(f"{'build TPU':28s} err {e:.3e}  mpo_bond {mb} ({time.perf_counter()-t0:.1f}s)")

e = scan_err(do_apply(W_t, psi_t, "range"))
log(f"{'all TPU':28s} err {e:.3e}")
