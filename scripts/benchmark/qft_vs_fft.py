"""QFT-MPS pipeline vs dense FFT.

Mirrors reference scripts/benchmark/qft_vs_fftw.jl (published at n=28 :sin on
M2 Max: apply-only ~0.8 ms; RSVD encode + apply ~2.7 s; dense FFTW ~8.7 s,
docs/src/benchmarking.md:261-265). The dense baseline here is jnp.fft.fft on
the same device.

Usage: python scripts/benchmark/qft_vs_fft.py [n_max]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 3)[0])  # repo root for qilaplace_tpu

import jax
import jax.numpy as jnp

from common import BenchmarkStore, TimeBudget, banner, timed

CHI = 64
CUTOFF = 1e-9
K, P, Q = 50, 5, 2


def main():
    n_max = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    from qilaplace_tpu import apply, build_qft_mpo, generate_signal, signal_mps
    from qilaplace_tpu.core.mpo import mpo_repad

    store = BenchmarkStore(
        "qft_vs_fft", {"chi": CHI, "cutoff": CUTOFF, "k": K, "p": P, "q": Q}
    )
    s_apply = store.series("qft_apply_only", {})
    s_e2e = store.series("rsvd_encode_plus_apply", {})
    s_fft = store.series("dense_fft", {})
    budgets = {k: TimeBudget(60.0) for k in ("a", "e", "f")}

    for n in range(10, n_max + 1, 2):
        banner(f"n={n}")
        x = generate_signal(n, kind="sin", freq=2 * 3.141592653589793,
                            dtype=jnp.float32)
        W = mpo_repad(
            build_qft_mpo(n, cutoff=1e-10, dtype=jnp.complex64), CHI
        )
        psi = signal_mps(x, method="rsvd", cutoff=CUTOFF, maxdim=CHI, chi=CHI,
                         k=K, p=P, q=Q)
        apply_fn = jax.jit(
            lambda W, p: apply(W, p, maxdim=CHI, cutoff=CUTOFF).cores
        )
        e2e_fn = jax.jit(
            lambda W, v: apply(
                W,
                signal_mps(v, method="rsvd", cutoff=CUTOFF, maxdim=CHI,
                           chi=CHI, k=K, p=P, q=Q),
                maxdim=CHI,
                cutoff=CUTOFF,
            ).cores
        )
        fft_fn = jax.jit(lambda v: jnp.fft.fft(v.astype(jnp.complex64)))
        if not budgets["a"].exceeded and not s_apply.has_point(n):
            t, _ = timed(apply_fn, W, psi)
            s_apply.add_point(n, {"seconds": t})
            budgets["a"].note(t)
            print(f"  apply-only {t * 1e3:.2f} ms", file=sys.stderr)
        if not budgets["e"].exceeded and not s_e2e.has_point(n):
            t, _ = timed(e2e_fn, W, x)
            s_e2e.add_point(n, {"seconds": t})
            budgets["e"].note(t)
            print(f"  encode+apply {t:.3f} s", file=sys.stderr)
        if not budgets["f"].exceeded and not s_fft.has_point(n):
            try:
                t, _ = timed(fft_fn, x)
                s_fft.add_point(n, {"seconds": t})
                budgets["f"].note(t)
                print(f"  dense fft {t:.3f} s", file=sys.stderr)
            except Exception as e:
                print(f"  dense fft failed: {e}", file=sys.stderr)
                budgets["f"].exceeded = True
        store.save(s_apply, s_e2e, s_fft)


if __name__ == "__main__":
    main()
