"""Microbenchmark of the device linalg primitives at the exact shapes the
zT pipeline uses. Run on the real TPU:  python scripts/profile_primitives.py

Tunneled-backend rules (CLAUDE.md): complex values must NEVER cross the
host<->device boundary (UNIMPLEMENTED, and the lazy error wedges the relay
for ~10+ minutes) — every test matrix is built INSIDE the jitted program
from a PRNG key, and the fetch is a scalar f32 reduction. Timings are
fetch-synced because block_until_ready does not block on this backend.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qilaplace_tpu.ops.jacobi import jacobi_eigh_pallas, fast_sweeps
from qilaplace_tpu.ops.truncation import truncated_svd
from qilaplace_tpu.ops.complexlinalg import gram_orthonormalize


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def crandn(key, shape):
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, shape) +
            1j * jax.random.normal(k2, shape)).astype(jnp.complex64)


def timeit(name, make_and_run, reps=5):
    """make_and_run: key -> array; jitted with a scalar f32 output."""
    g = jax.jit(
        lambda key: jnp.sum(jnp.abs(make_and_run(key))).astype(jnp.float32)
    )
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    np.asarray(g(key))
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(g(key))
        ts.append(time.perf_counter() - t0)
    log(f"{name:55s} warm {1e3*np.median(ts):9.2f} ms  "
        f"(compile+1st {t_compile:.1f}s)")
    return float(np.median(ts))


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else ""

    if only in ("", "eigh"):
        for m, B in [(40, 1), (64, 1), (128, 1), (160, 1), (256, 1),
                     (40, 8), (160, 2), (160, 30)]:
            sw = fast_sweeps(m)

            def run(key, m=m, B=B, sw=sw):
                A = crandn(key, (B, m, m))
                H = A @ jnp.conj(jnp.swapaxes(A, -1, -2))
                return jacobi_eigh_pallas(H, sweeps=sw)[0]

            timeit(f"jacobi_pallas m={m} B={B} sweeps={sw}", run)

    if only in ("", "svd"):
        shapes = [
            ("DT fold zip   [128,2048] maxdim32", (128, 2048), 32),
            ("DT fold polish [128,128] maxdim32", (128, 128), 32),
            ("fuse zip      [512,1024] maxdim128", (512, 1024), 128),
            ("fuse polish   [512,512] maxdim128", (512, 512), 128),
            ("apply zip     [256,16384] maxdim128", (256, 16384), 128),
            ("encode fanout [256,256] maxdim128", (256, 256), 128),
        ]
        for name, (a, b), maxdim in shapes:
            def run(key, a=a, b=b, maxdim=maxdim):
                M = crandn(key, (a, b))
                U, s, Vh, rank = truncated_svd(M, cutoff=1e-7, maxdim=maxdim)
                return s

            timeit(f"truncated_svd {name}", run)

        # batched variants (vmap) at fold shapes
        for Bn in (2,):
            def runb(key, Bn=Bn):
                M = crandn(key, (Bn, 128, 2048))
                f = lambda Mi: truncated_svd(Mi, cutoff=1e-7, maxdim=32)[1]
                return jax.vmap(f)(M)

            timeit(f"truncated_svd vmap B={Bn} [128,2048] maxdim32", runb)

    if only in ("", "orth"):
        for a, l in [(16384, 160), (256, 160), (2048, 40)]:
            def run(key, a=a, l=l):
                Y = crandn(key, (a, l))
                return gram_orthonormalize(Y)[0]

            timeit(f"gram_orthonormalize [{a},{l}]", run)

    if only in ("", "fold"):
        from qilaplace_tpu.core.mpo import MPO
        from qilaplace_tpu.ops.apply import _compose_fused
        n2 = 60
        for chi, chi_l, pol in [(32, 64, "reverse"), (32, 64, "full"),
                                (128, 32, "full"), (128, 32, "reverse")]:
            def run(key, chi=chi, chi_l=chi_l, pol=pol):
                k1, k2 = jax.random.split(key)
                acc = MPO(
                    cores=crandn(k1, (n2, chi, 2, 2, chi)) * 0.1,
                    ranks=jnp.full((n2 + 1,), chi, jnp.int32)
                    .at[0].set(1).at[n2].set(1),
                )
                lay = MPO(
                    cores=crandn(k2, (n2, chi_l, 2, 2, chi_l)) * 0.1,
                    ranks=jnp.full((n2 + 1,), chi_l, jnp.int32)
                    .at[0].set(1).at[n2].set(1),
                )
                out = _compose_fused(
                    acc, lay, chi_out=chi, zip_maxdim=chi, cutoff=1e-7,
                    maxdim=chi, chi_work=chi, polish=pol)
                return out.ranks

            timeit(f"fold layer 2n=60 chi={chi} chi_l={chi_l} {pol}",
                   run, reps=3)

        # vmapped concurrent fold layer (the build_zt factor configuration)
        def runv(key):
            k1, k2 = jax.random.split(key)
            chi, chi_l = 32, 64
            acc = MPO(
                cores=crandn(k1, (2, n2, chi, 2, 2, chi)) * 0.1,
                ranks=jnp.broadcast_to(
                    jnp.full((n2 + 1,), chi, jnp.int32).at[0].set(1)
                    .at[n2].set(1), (2, n2 + 1)),
            )
            lay = crandn(k2, (2, n2, chi_l, 2, 2, chi_l)) * 0.1
            lr = jnp.ones((2, n2 + 1), jnp.int32)

            def fold_one(c, r, lc, lrr):
                out = _compose_fused(
                    MPO(cores=c, ranks=r), MPO(cores=lc, ranks=lrr),
                    chi_out=32, zip_maxdim=32, cutoff=1e-7, maxdim=32,
                    chi_work=32, polish="reverse")
                return out.ranks

            return jax.vmap(fold_one)(acc.cores, acc.ranks, lay, lr)

        timeit("fold layer VMAPPED x2 2n=60 chi=32 chi_l=64 rev", runv,
               reps=3)


if __name__ == "__main__":
    main()
