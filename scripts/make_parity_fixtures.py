"""Generate the committed parity fixtures (tests/fixtures/parity_n*.npz).

The BASELINE target is amplitude parity <= 1e-8 vs the Julia reference at
n <= 20. No Julia runtime exists in this environment, so the stand-in
reference is the closed-form transform oracle of the sin_decay signal
(qilaplace_tpu.signals.oracles) — validated against brute-force summation
with exact integer phase reduction to ~1e-13 relative here, at every n where
the brute force is affordable (the reference's own zT tests validate against
the same analytic formula, test/test_zt_transformer.jl:12-40).

Each fixture stores: the signal parameters, the sampled (k, l) readout
indices (half structured around the spectral peak, half uniform), and the
oracle values (complex128 as split re/im — the package's transfer-safe npz
convention, utils/io.py).

Run: python scripts/make_parity_fixtures.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from qilaplace_tpu.signals.oracles import (
    sin_decay_dft_oracle,
    sin_decay_zt_oracle,
)

FIXTURE_DIR = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures"
)
WR = 2 * np.pi
FREQ, DECAY = 2.0, 0.5
S = 64  # samples per transform


def samples(n: int, rng) -> tuple[np.ndarray, np.ndarray]:
    N = 2**n
    ks = np.concatenate(
        [rng.integers(0, min(64, N), S // 2), rng.integers(0, N, S // 2)]
    )
    ls = np.concatenate(
        [rng.integers(0, min(2048, N), S // 2), rng.integers(0, N, S // 2)]
    )
    return ks.astype(np.int64), ls.astype(np.int64)


def brute_check(n: int, ks, ls, chi_oracle) -> float:
    """Brute-force validation of the closed form (exact phase reduction)."""
    N = 2**n
    dt = 1.0 / (FREQ * N)
    j = np.arange(N, dtype=np.float64)
    x = np.sin(FREQ * dt * j) * np.exp(-DECAY * dt * j)
    xu = x / np.linalg.norm(x)
    jj = np.arange(N, dtype=np.int64)
    worst = 0.0
    for i in range(len(ks)):
        ph = 2 * np.pi * ((int(ls[i]) * jj) % N) / N
        w = np.exp(-WR * int(ks[i]) * j / N) * (np.cos(ph) - 1j * np.sin(ph))
        ref = np.sum(xu * w) / N
        worst = max(worst, abs(ref - chi_oracle[i]))
    return worst


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for n in (8, 12, 16, 20):
        rng = np.random.default_rng(1000 + n)
        ks, ls = samples(n, rng)
        chi = sin_decay_zt_oracle(n, ks, ls, wr=WR, freq=FREQ,
                                  decay_rate=DECAY)
        F = sin_decay_dft_oracle(n, ks, freq=FREQ, decay_rate=DECAY)
        if n <= 16:
            err = brute_check(n, ks, ls, chi)
            peak = np.abs(chi).max()
            print(f"n={n}: closed-form vs brute force max abs {err:.2e} "
                  f"(peak {peak:.2e})")
            assert err < 1e-12 * max(1.0, peak / np.abs(chi).max())
        path = os.path.join(FIXTURE_DIR, f"parity_n{n}.npz")
        np.savez(
            path,
            n=n,
            wr=WR,
            freq=FREQ,
            decay_rate=DECAY,
            ks=ks,
            ls=ls,
            chi_re=chi.real,
            chi_im=chi.imag,
            dft_re=F.real,
            dft_im=F.imag,
        )
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
