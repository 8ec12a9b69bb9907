"""Follow-up accuracy probes at n=10 on the TPU:
1. encode fidelity: dense(psi_tpu) vs dense(psi_cpu) directly.
2. build at chi_work=256 (capacity >= local fuse rank 144) vs 128.
3. apply at chi_work=256.
4. all-CPU baseline at cutoff 1e-9 (the achievable floor at chi=128).
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
from qilaplace_tpu.core.mps import coefficient_batch, mps_to_vector
from qilaplace_tpu.ops.apply import apply
from qilaplace_tpu.signals.oracles import sin_decay_norm, sin_decay_zt_oracle

WR = 2 * np.pi
FREQ, DECAY = 2.0, 0.5
CHI = 128
n = int(sys.argv[1]) if len(sys.argv) > 1 else 10

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


def scan_err(out, cutoff_label=""):
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


def enc(cutoff):
    x = generate_signal(n, kind="sin_decay", freq=FREQ, decay_rate=DECAY,
                        dtype=jnp.float32)
    return signal_ztmps(x, method="rsvd", k=50, p=5, q=2, cutoff=cutoff,
                        maxdim=CHI)


# ---- 1. encode fidelity (dense diff, n=10 only: 2^20 chain entries) ----
cutoff = 1e-7
psi_h = on_cpu(lambda: enc(cutoff))
psi_cpu = ship(psi_h)
psi_t = enc(cutoff)

@jax.jit
def dense_diff(a, b):
    va = mps_to_vector(a)
    vb = mps_to_vector(b)
    d = va - vb
    return (jnp.linalg.norm(d) / jnp.linalg.norm(vb)).real.astype(jnp.float32)

if n <= 10:
    log(f"encode dense rel diff (tpu vs cpu): {np.asarray(dense_diff(psi_t, psi_cpu)):.3e}")

# ---- 2/3. build & apply chi_work variants ----
W_h = on_cpu(lambda: build_zt_mpo(n, WR, cutoff=cutoff, maxdim=CHI, chi=CHI,
                                  dtype=np.complex64, chi_work=CHI))
W_cpu = ship(W_h)

for cw in (128, 256):
    t0 = time.perf_counter()
    W_t = build_zt_mpo(n, WR, cutoff=cutoff, maxdim=CHI, chi=CHI,
                       dtype=np.complex64, chi_work=cw)
    mb = int(np.asarray(W_t.chain.ranks).max())
    out = jax.jit(lambda W, p: apply(W, p, maxdim=CHI, cutoff=cutoff,
                                     final_sweeps=0))(W_t, psi_cpu)
    log(f"build TPU chi_work={cw}: err {scan_err(out):.3e} mpo_bond {mb} "
        f"({time.perf_counter()-t0:.1f}s)")

for cw in (128, 256):
    t0 = time.perf_counter()
    out = jax.jit(lambda W, p: apply(W, p, maxdim=CHI, cutoff=cutoff,
                                     final_sweeps=0, chi_work=cw))(
        W_cpu, psi_cpu)
    log(f"apply TPU svd chi_work={cw}: err {scan_err(out):.3e} "
        f"({time.perf_counter()-t0:.1f}s)")

# ---- 4. all-CPU floor at 1e-9 ----
def cpu_all(cutoff):
    p = enc(cutoff)
    W = build_zt_mpo(n, WR, cutoff=cutoff, maxdim=CHI, chi=CHI,
                     dtype=np.complex64, chi_work=CHI)
    return apply(W, p, maxdim=CHI, cutoff=cutoff, final_sweeps=0)

for c in (1e-7, 1e-9, 1e-11):
    out_h = on_cpu(lambda: cpu_all(c))
    log(f"all-CPU cutoff={c:g}: err {scan_err(ship(out_h)):.3e}")
