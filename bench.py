"""Headline benchmark: zT END-TO-END (encode + MPO build + fused apply +
4096-point pole scan) at n=30, chi=128 on the TPU.

Baseline: the reference's zT end-to-end (signal_ztmps + apply) at m=60
(n=30) = 20.036 s on an M2 Max (reference docs/src/benchmarking.md:307;
BASELINE.md row 12 — the reference number does NOT even include the MPO
build, which this bench does include). vs_baseline = 20.036 / value.
Timings are medians of warm runs, matching the reference's
BenchmarkTools-means-after-warmup protocol (docs/src/benchmarking.md:10-16).

Stage configuration (round 3 defaults — each knob keeps the round-2 device
path selectable for comparison):

* encode  BENCH_ENCODE=cross (default) | rsvd
  cross: host-f64 TT cross-interpolation (signals/cross_encode.py) — reads
  O(n r^2) of the 2^n samples, every arithmetic step f64. By default the
  signal is passed as its closed form (quantics function encoding, nothing
  materialized); BENCH_SIGNAL=vector materializes the 2^n vector first
  (untimed) and crosses its entries. rsvd: the on-device
  divide-and-conquer GEMM tree.
* build   BENCH_BUILD=analytic (default) | gate
  analytic: rail-cross + exact interleave + one deterministic f64
  compression (transforms/analytic.py) — milliseconds on the host, every
  core entry f64-accurate. gate: the reference-parity gate-layer fold on
  the device (device Jacobi linalg).
* readout BENCH_READOUT=direct (default on TPU) | apply64 (default in cpu
  mode) | pallas | scan
  direct: <config|W|psi> zipper per scan point, no intermediate truncated
  product (ops/apply.py apply_coefficient_batch) — the f32 accuracy route.
  apply64: fused range-zip apply once in f64, tighten, batch-read — the
  CPU-fallback route (f64 has no eps*norm/peak readout floor, and sharing
  the MPO contraction across configs is ~5x fewer flops on one host core).
  pallas/scan: fused apply then batched coefficient readout (f32).

Modes (setup placement), tried in order:

* "tpu": host (cross/analytic) or device (rsvd/gate) setup, apply + scan
  on the TPU. With the default host setup the device arena never sees the
  encode, so a single process handles every n.
* "tpu2": the round-2 two-subprocess split (device setup -> npz -> apply)
  needed by BENCH_ENCODE=rsvd at n >= 28 (the tunneled runtime never
  returns the encode's multi-GiB arena to the pool).
* "cpu" (last resort): everything including the scan runs on host CPU —
  produces an honest number even with the TPU relay down (the JSON's
  setup_device/apply_device fields say so).

Accuracy: the scanned coefficients are compared against the closed-form
chi(k, l) of the sin_decay input (signals/oracles.py — O(1) per point, so it
works at n=30 where a dense reference is 2^30 terms);
``max_err_rel_peak`` = max |got - oracle| / max |oracle| over the 4096
sampled points.

Robustness: each (n, mode) attempt runs in a subprocess (a crashed TPU
worker wedges the whole jax process); a 90 s probe subprocess checks the
tunneled backend actually answers before any TPU-mode attempt (a wedged
relay HANGS jax.devices(), it does not error); the parent prints exactly
ONE JSON line to stdout.
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
CUTOFF = float(os.environ.get("BENCH_CUTOFF", "1e-9"))
W_CUTOFF = float(os.environ.get("BENCH_W_CUTOFF", "1e-12"))
PSI_CUTOFF = float(os.environ.get("BENCH_PSI_CUTOFF", "1e-12"))
ENCODE = os.environ.get("BENCH_ENCODE", "cross")
BUILD = os.environ.get("BENCH_BUILD", "analytic")
WR = 2 * 3.141592653589793
FREQ, DECAY = 2.0, 0.5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scan_samples(n):
    """4096 (k, l) scan points: half structured in the near-peak region
    (small damping index k, angular index l near the spectral line — where
    |chi| is within a few decades of the peak and the accuracy comparison
    is meaningful), half uniform over the full grid (pole-scan workload
    parity; there the oracle values sit below any finite truncation floor
    and only the timing matters)."""
    import numpy as np

    N = 2**n
    rng = np.random.default_rng(0)
    h = N_SCAN // 2
    ks = np.concatenate(
        [rng.integers(0, min(256, N), h), rng.integers(0, N, h)]
    )
    ls = np.concatenate(
        [rng.integers(0, min(8192, N), h) % N, rng.integers(0, N, h)]
    )
    kb = ((ks[:, None] >> np.arange(n)) & 1).astype(np.int32)  # LSB-first
    lb = ((ls[:, None] >> np.arange(n)) & 1).astype(np.int32)
    cfg = np.stack([kb, lb], axis=2).reshape(N_SCAN, 2 * n)
    return ks, ls, cfg


def multi_sin_exp_fn(n):
    """The multi_sin_exp bench signal (generate_signal defaults: 10 seeded
    damped sinusoids) as a closed-form callable + its oracle parameters —
    the second accuracy family (round-3 verdict #5: 1.5e-6 must not be a
    one-signal result)."""
    import numpy as np

    N = 2**n
    dt = 1.0 / (2 * np.pi * N)  # generate_signal default freq = 2*pi
    n_terms = 10
    rng_a = np.random.default_rng(1001)
    rng_w = np.random.default_rng(2002)
    rng_l = np.random.default_rng(4004)
    ak = rng_a.random(n_terms)
    ak = ak / np.linalg.norm(ak)
    wk = (40.0 * dt) * (rng_w.random(n_terms) - 0.5)
    lk = (2.0 * dt) * rng_l.random(n_terms)

    def f(j):
        j = j.astype(np.float64)
        out = np.zeros_like(j)
        for a, w, lam in zip(ak, wk, lk):
            out += a * np.sin(w * j) * np.exp(-lam * j)
        return out

    f.n_bits = n
    f.oracle_params = dict(ws=wk, lams=lk, phs=np.zeros(n_terms), amps=ak)
    return f


def signal_fn(n):
    """The sin_decay bench signal as a closed-form entry function
    x_j = sin(w j) e^{-lam j}, w = freq * dt, lam = decay * dt,
    dt = 1 / (freq * 2^n) — matching signals/generate.py sin_decay. The
    cross encoder reads only the O(n r^2) entries it pivots on (quantics
    function encoding), so the default cross path never materializes the
    2^n-sample vector at all (at n = 30 that vector is 8 GiB and costs
    ~2.5 min of this host's single core just to fill)."""
    import numpy as np

    N = 2**n
    dt = 1.0 / (FREQ * N)
    w, lam = FREQ * dt, DECAY * dt

    def f(j):
        j = j.astype(np.float64)
        return np.sin(w * j) * np.exp(-lam * j)

    f.n_bits = n
    return f


def host_signal(n):
    """sin_decay materialized on the host in f64 (BENCH_SIGNAL=vector — the
    analogue of the reference's pre-benchmark signal construction, likewise
    excluded from the timed region). Chunked to bound temporaries."""
    import numpy as np

    fn = signal_fn(n)
    N = 2**n
    x = np.empty(N, dtype=np.float64)
    step = 1 << 24
    for lo in range(0, N, step):
        x[lo : lo + step] = fn(np.arange(lo, min(lo + step, N),
                                         dtype=np.int64))
    return x


def accuracy(n, got_re, got_im, ks, ls, oracle_params=None):
    """max |got - oracle| / peak |oracle| over the structured half of the
    scan (the random half sits below the truncation floor by construction
    — comparing there measures the cutoff, not the pipeline).
    ``oracle_params=None`` means the sin_decay headline family; otherwise
    the damped-sinusoid-sum closed form with the given term parameters."""
    import numpy as np

    from qilaplace_tpu.signals.oracles import (
        damped_sin_norm,
        damped_sin_zt_oracle,
        sin_decay_norm,
        sin_decay_zt_oracle,
    )

    h = N_SCAN // 2
    if oracle_params is None:
        want = sin_decay_zt_oracle(n, ks[:h], ls[:h], wr=WR, freq=FREQ,
                                   decay_rate=DECAY)
        nrm = sin_decay_norm(n, freq=FREQ, decay_rate=DECAY)
    else:
        want = damped_sin_zt_oracle(n, ks[:h], ls[:h], wr=WR,
                                    **oracle_params)
        nrm = damped_sin_norm(n, **oracle_params)
    got = (
        np.asarray(got_re[:h], np.float64)
        + 1j * np.asarray(got_im[:h], np.float64)
    )
    got = got / nrm
    peak = np.abs(want).max()
    return float(np.abs(got - want).max() / peak), float(peak)


APPLY_CAP = int(os.environ.get("BENCH_APPLY_MAXDIM", "96"))


def make_step(readout, configs):
    """The jitted apply+scan program (placement follows its operands)."""
    import jax
    import jax.numpy as jnp

    from qilaplace_tpu.core.mps import coefficient_batch
    from qilaplace_tpu.ops.apply import apply, apply_coefficient_batch
    from qilaplace_tpu.ops.pallas_kernels import coefficient_batch_pallas

    if readout in ("direct", "fused"):
        # "direct" auto-routes through the Kron-fused Pallas zipper
        # (zipper_chain + VMEM-resident kernel) on TPU when the effective
        # chain chi_eff = chi_W * chi_psi stays MXU/VMEM-friendly —
        # measured n=30: 60 ms vs 74 ms for the factored XLA zipper AND a
        # lower f32 floor (1.3e-6 vs 1.8e-6; the s-sum contracts against
        # the state up front). Wider states (chi_eff > 256, e.g. the
        # rank-7 multi_sin_exp) keep the factored form whose flops grow
        # only linearly in chi_psi. BENCH_READOUT=fused forces the fused
        # route regardless.
        from qilaplace_tpu.ops.apply import zipper_chain

        @jax.jit
        def step_factored(W, psi, configs):
            vals = apply_coefficient_batch(W, psi, configs)
            return jnp.real(vals), jnp.imag(vals)  # complex not fetchable

        @jax.jit
        def step_fused(W, psi, configs):
            vals = coefficient_batch_pallas(zipper_chain(W, psi), configs)
            return jnp.real(vals), jnp.imag(vals)

        def step(W, psi, configs):
            chi_eff = W.chain.chi * psi.chain.chi
            on_tpu = jax.default_backend() not in ("cpu",)
            if readout == "fused" or (on_tpu and chi_eff <= 256):
                return step_fused(W, psi, configs)
            return step_factored(W, psi, configs)

    elif readout == "apply64":
        # CPU-fallback route (TPU relay down): apply ONCE per scan in f64
        # (native LAPACK host arithmetic — the f32 eps*norm/peak readout
        # floor that motivates the direct zipper does not exist in f64),
        # tighten the product to its rank bucket, then batch-read. The MPO
        # bond is contracted once instead of riding through every config:
        # ~5x fewer flops than the direct zipper on this one-core host
        # (measured n=30: 1.9 s vs 7.1 s at the same 1.7e-6 rel-peak err).
        from qilaplace_tpu.scan.pole_scan import tighten as _tighten

        apply_j = jax.jit(
            lambda W, psi: apply(W, psi, maxdim=APPLY_CAP, cutoff=CUTOFF,
                                 final_sweeps=0, zip_mode="range")
        )
        read_j = jax.jit(coefficient_batch)

        def step(W, psi, configs):
            out = _tighten(apply_j(W, psi))  # host rank fetch, tight bucket
            vals = read_j(out, configs)
            return jnp.real(vals), jnp.imag(vals)

    else:
        read_fn = (
            coefficient_batch_pallas if readout == "pallas"
            else coefficient_batch
        )

        @jax.jit
        def step(W, psi, configs):
            out = apply(W, psi, maxdim=CHI, cutoff=CUTOFF, final_sweeps=0,
                        zip_mode="range")
            vals = read_fn(out, configs)
            return jnp.real(vals), jnp.imag(vals)

    return step


def child_host_setup(n: int, mode: str) -> None:
    """Host-f64 encode + build through the PUBLIC library API
    (signal_ztmps(method="cross"), zt_mpo(engine="analytic"), tighten,
    utils.io.ship), apply + 4096-point scan on the TPU ("tpu") or entirely
    on the host CPU ("cpu" last resort). The bench is a thin caller of the
    same code path ZTPipeline/coarse_to_fine_pole_search run (round-3
    verdict #1)."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    if mode == "cpu":
        # pin BEFORE any device lookup: backend discovery dials the
        # tunneled TPU plugin, and a wedged relay HANGS it. The CPU
        # fallback runs in f64 (native LAPACK — no tunnel restrictions),
        # which unlocks the cheaper apply-then-read scan route below.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    cpu = jax.local_devices(backend="cpu")[0]
    dev = cpu if mode == "cpu" else jax.devices()[0]
    log(f"devices: apply={dev}, mode={mode}, encode={ENCODE}, build={BUILD}")

    readout = os.environ.get("BENCH_READOUT",
                             "apply64" if mode == "cpu" else "direct")
    ks, ls, cfg_np = scan_samples(n)
    configs = jax.device_put(cfg_np, dev)
    step = make_step(readout, configs)

    if os.environ.get("BENCH_SIGNAL", "callable") == "vector":
        t0 = time.perf_counter()
        x = host_signal(n)  # excluded from timed region (reference parity)
        log(f"host signal materialized ({x.nbytes / 2**30:.1f} GiB, "
            f"{time.perf_counter() - t0:.1f}s, untimed)")
    else:
        x = signal_fn(n)  # quantics function encoding: nothing materialized
        log("signal: closed-form callable (cross reads O(n r^2) entries)")

    from qilaplace_tpu import signal_ztmps, tighten
    from qilaplace_tpu.transforms.analytic import zt_product_pack
    from qilaplace_tpu.utils.io import cached_zt_pack, ship, ship_state_and_pack

    cache_dir = tempfile.mkdtemp(prefix="qilaplace_bench_mpo_")

    def setup_once(cache: bool = False):
        # encode + build on the host CPU backend (the tunneled device must
        # never see complex or f64); the build produces the FACTOR PACK
        # (rail B-forms + kept-pair indices, ~1.5 MB of f32 halves) and the
        # kron cores are assembled ON DEVICE — the assembled operator
        # (~16 MB split-f32) never crosses the tunnel
        with jax.default_device(cpu):
            t0 = time.perf_counter()
            psi = tighten(signal_ztmps(x, method="cross", cutoff=PSI_CUTOFF,
                                       maxdim=CHI))
            t_enc = time.perf_counter() - t0
            t0 = time.perf_counter()
            if cache:
                pack, _ = cached_zt_pack(n, WR, cutoff=W_CUTOFF, maxdim=CHI,
                                         cache_dir=cache_dir)
            else:
                pack = zt_product_pack(n, WR, cutoff=W_CUTOFF, maxdim=CHI)
            t_build = time.perf_counter() - t0
        # state + factor pack ride ONE coalesced float transfer + ONE int32
        # transfer + ONE assembly program (3 dispatches instead of 6 — each
        # costs ~15-30 ms of tunnel latency)
        t0 = time.perf_counter()
        psi_dev, W_dev = ship_state_and_pack(
            psi, pack, dev,
            state_dtype=jnp.float64 if mode == "cpu" else jnp.float32,
            mpo_dtype=jnp.complex128 if mode == "cpu" else jnp.complex64,
        )
        jax.block_until_ready(W_dev.chain.cores)
        t_ship = time.perf_counter() - t0
        return psi_dev, W_dev, t_enc, t_build, t_ship

    t0 = time.perf_counter()
    psi, W, t_enc, t_build, t_ship = setup_once()
    re, im = step(W, psi, configs)
    np.asarray(re)  # fetch-sync: block_until_ready does not block on axon
    log(f"warmup total (incl. compiles) {time.perf_counter() - t0:.2f}s "
        f"(encode {t_enc:.2f} build {t_build:.2f} ship {t_ship:.2f})")

    # cold-build timing loop (the headline: nothing cached between reps)
    times, parts = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        psi, W, t_enc, t_build, t_ship = setup_once()
        re, im = step(W, psi, configs)
        re_h, im_h = np.asarray(re), np.asarray(im)
        times.append(time.perf_counter() - t0)
        parts.append((t_enc, t_build, t_ship))
    mid = int(np.argsort(times)[len(times) // 2])
    t_enc, t_build, t_ship = parts[mid]
    t_apply = float(np.median(times)) - t_enc - t_build - t_ship

    # warm-path build: persistent artifact cache (first call saves, later
    # calls are a ~ms uncompressed npz load of the factor pack)
    with jax.default_device(cpu):
        cached_zt_pack(n, WR, cutoff=W_CUTOFF, maxdim=CHI,
                       cache_dir=cache_dir)
        warm = []
        for _ in range(3):
            t0 = time.perf_counter()
            cached_zt_pack(n, WR, cutoff=W_CUTOFF, maxdim=CHI,
                           cache_dir=cache_dir)
            warm.append(time.perf_counter() - t0)
    t_build_cache = float(np.median(warm))

    # second accuracy family (same operator, signal-independent): the
    # multi_sin_exp closed form — untimed, accuracy-only
    x2 = multi_sin_exp_fn(n)
    with jax.default_device(cpu):
        psi2 = tighten(signal_ztmps(x2, method="cross", cutoff=PSI_CUTOFF,
                                    maxdim=CHI))
    psi2_dev = ship(psi2, dev,
                    dtype=jnp.float64 if mode == "cpu" else jnp.float32)
    re2, im2 = step(W, psi2_dev, configs)
    err2, _ = accuracy(n, np.asarray(re2), np.asarray(im2), ks, ls,
                       oracle_params=x2.oracle_params)
    log(f"second family (multi_sin_exp): max_err_rel_peak {err2:.3e}")

    emit(n, mode, t_enc, t_build, t_ship, t_apply, re_h, im_h, ks, ls, W,
         readout, setup_device="host-f64",
         apply_device="cpu" if mode == "cpu" else "tpu",
         t_build_cache=t_build_cache, err2=err2, psi=psi)


PEAK_F32_FLOPS = 49.2e12  # v5e MXU f32 peak estimate (bf16 197 TF / 4)


def _scan_flops(n, W, psi):
    """Flops of the direct-readout step: per site and per config the zipper
    evaluates both output-bit branches, each summing two s-values of two
    GEMM contractions (B*cw*cp*cw and B*cw*cp*cp complex MACs, 8 real
    flops each) — the mechanical model the round-3 verdict asked for."""
    cw = W.chain.chi
    cp = psi.chain.chi
    per_site = 2 * 2 * N_SCAN * cw * cp * (cw + cp) * 8
    return 2 * n * per_site


def emit(n, mode, t_enc, t_build, t_ship, t_apply, re_h, im_h, ks, ls, W,
         readout, setup_device, apply_device, t_build_cache=None,
         err2=None, psi=None):
    import numpy as np

    t_total = t_enc + t_build + t_ship + t_apply
    err, peak = accuracy(n, re_h, im_h, ks, ls)
    mpo_bond = int(np.asarray(W.chain.ranks).max())
    log(
        f"end_to_end {t_total:.3f}s = encode {t_enc:.2f} + build "
        f"{t_build:.2f} + ship {t_ship:.2f} + apply+scan {t_apply:.3f}; "
        f"|chi| peak {peak:.3e}, max_err_rel_peak {err:.3e}, "
        f"mpo bond {mpo_bond}"
    )
    out = {
        "metric": "zt_end_to_end_chi128_wall_s",
        "value": round(t_total, 6),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / t_total, 2),
        "n": n,
        "encode_s": round(t_enc, 4),
        "build_s": round(t_build, 4),
        "ship_s": round(t_ship, 4),
        "apply_scan_s": round(t_apply, 6),
        "max_err_rel_peak": round(err, 10),
        "mpo_bond": mpo_bond,
        "encode": ENCODE,
        "build": BUILD,
        "setup_device": setup_device,
        "apply_device": apply_device,
        "readout": readout,
    }
    if t_build_cache is not None:
        out["build_cache_s"] = round(t_build_cache, 4)
        out["value_warm"] = round(
            t_enc + t_build_cache + t_ship + t_apply, 6
        )
        out["vs_baseline_warm"] = round(BASELINE_S / out["value_warm"], 2)
    if err2 is not None:
        out["max_err_rel_peak_multi_sin_exp"] = round(err2, 10)
    if psi is not None and readout == "direct":
        flops = _scan_flops(n, W, psi)
        out["scan_gflops"] = round(flops / 1e9, 1)
        if apply_device == "tpu":
            out["scan_mfu_est"] = round(
                flops / max(t_apply, 1e-9) / PEAK_F32_FLOPS, 4
            )
    print(json.dumps(out), flush=True)


def child(n: int, mode: str) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # observability hook: QILAPLACE_TRACE_DIR=<dir> captures a jax.profiler
    # trace of the whole child (view with tensorboard / xprof)
    trace_dir = os.environ.get("QILAPLACE_TRACE_DIR")
    if trace_dir:
        import atexit

        jax.profiler.start_trace(trace_dir)
        atexit.register(jax.profiler.stop_trace)

    if ENCODE == "cross" and BUILD == "analytic" and mode in ("tpu", "cpu"):
        return child_host_setup(n, mode)

    import numpy as np
    import jax.numpy as jnp

    from qilaplace_tpu import build_zt_mpo, generate_signal, signal_ztmps
    from qilaplace_tpu.core.mps import MPS, ZTMPS
    from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO

    cpu = jax.local_devices(backend="cpu")[0]
    tpu = jax.devices()[0]
    log(f"devices: tpu={tpu}, mode={mode}")

    ks, ls, cfg_np = scan_samples(n)
    configs = jax.device_put(cfg_np, tpu)
    readout = os.environ.get("BENCH_READOUT", "direct")
    step = make_step(readout, configs)

    def tight(state, repad_fn):
        # Shrink the padded chi bucket to the smallest multiple of 8 that
        # holds the realized ranks (host-known after the rank fetch above):
        # the direct-readout zipper's per-site GEMMs scale with the BUCKET,
        # not the rank — at n=30 psi's true rank is ~4-16 inside a chi=128
        # pad, an 8x waste of MXU work and HBM.
        chain = state.chain
        r = int(np.asarray(chain.ranks).max())
        return repad_fn(state, min(chain.chi, max(8, ((r + 7) // 8) * 8)))

    if readout == "direct":
        from qilaplace_tpu.core.mps import repad
        from qilaplace_tpu.core.mpo import mpo_repad

        def maybe_tight(W, psi):
            return tight(W, mpo_repad), tight(psi, repad)
    else:
        def maybe_tight(W, psi):
            return W, psi

    def encode_build():
        # Stage boundaries are FETCH-synced (np.asarray of the int32 ranks,
        # an output of the same program): the tunneled backend's
        # block_until_ready does not actually block — execution completes
        # lazily at fetch time, which silently voids non-fetch timings.
        x = generate_signal(n, kind="sin_decay", freq=FREQ, decay_rate=DECAY,
                            dtype=jnp.float32)
        t0 = time.perf_counter()
        psi = signal_ztmps(x, method="rsvd", k=50, p=5, q=2, cutoff=CUTOFF,
                           maxdim=CHI)
        np.asarray(psi.chain.ranks)
        # free the 2^n-sample signal NOW: at n=30 it is 4 GiB of HBM and
        # the tunneled runtime never recycles its arena
        x.delete()
        t_enc = time.perf_counter() - t0
        t0 = time.perf_counter()
        W = build_zt_mpo(n, WR, cutoff=CUTOFF, maxdim=CHI, chi=CHI,
                         dtype=np.complex64, chi_work=CHI)
        np.asarray(W.chain.ranks)
        t_build = time.perf_counter() - t0
        W, psi = maybe_tight(W, psi)
        return psi, W, t_enc, t_build

    if mode == "tpu":
        # single-process all-TPU pipeline (fits the device arena up to
        # n ~ 26): warmup pass compiles every stage, then whole warm
        # iterations are timed end to end (the closing fetch forces
        # completion of the full chain, so the TOTAL is sound even though
        # the per-stage split relies on the ranks fetches above)
        t0 = time.perf_counter()
        psi, W, t_enc, t_build = encode_build()
        log(f"warmup encode {t_enc:.2f}s build {t_build:.2f}s")
        re, im = step(W, psi, configs)
        np.asarray(re)
        log(f"warmup total (incl. compiles) {time.perf_counter() - t0:.2f}s")

        times, parts = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            psi, W, t_enc, t_build = encode_build()
            re, im = step(W, psi, configs)
            re_h, im_h = np.asarray(re), np.asarray(im)
            times.append(time.perf_counter() - t0)
            parts.append((t_enc, t_build))
        t_enc, t_build = parts[int(np.argsort(times)[len(times) // 2])]
        t_apply = float(np.median(times)) - t_enc - t_build
        emit(n, mode, t_enc, t_build, 0.0, t_apply, re_h, im_h, ks, ls, W,
             readout, setup_device="tpu", apply_device="tpu")

    elif mode == "tpu-setup":
        # Phase A of the split all-TPU pipeline (BENCH_ENCODE=rsvd,
        # n >= 28): encode + build on the device, persist the (small) state
        # as split re/im f32 for phase B. A separate process because the
        # tunneled runtime never returns the encode's multi-GiB arena to
        # the pool — at n=30 even a 15 MB fetch RESOURCE_EXHAUSTs after two
        # encodes in one process. One pass only; timings are warm when the
        # persistent compile cache is populated (the parent retries once so
        # the second attempt reports warm numbers).
        x = generate_signal(n, kind="sin_decay", freq=FREQ, decay_rate=DECAY,
                            dtype=jnp.float32)
        t0 = time.perf_counter()
        psi = signal_ztmps(x, method="rsvd", k=50, p=5, q=2, cutoff=CUTOFF,
                           maxdim=CHI)
        np.asarray(psi.chain.ranks)
        x.delete()
        t_enc = time.perf_counter() - t0
        psi_host = {
            "psi_re": np.asarray(jnp.real(psi.chain.cores)),
            "psi_im": np.asarray(jnp.imag(psi.chain.cores)),
            "psi_ranks": np.asarray(psi.chain.ranks),
            "psi_amp": np.asarray(psi.chain.amplitude.astype(jnp.float32)),
        }
        del psi
        log(f"encode {t_enc:.2f}s")
        t0 = time.perf_counter()
        W = build_zt_mpo(n, WR, cutoff=CUTOFF, maxdim=CHI, chi=CHI,
                         dtype=np.complex64, chi_work=CHI)
        np.asarray(W.chain.ranks)
        t_build = time.perf_counter() - t0
        log(f"build {t_build:.2f}s")
        # artifact-cache warm build: save once, time a load+ship — the
        # production path for repeated (n, wr, chi, cutoff) configurations
        from qilaplace_tpu.utils import io as qio

        cache_path = os.environ["BENCH_STATE"] + ".mpo.npz"
        qio.save(cache_path, W)
        t0 = time.perf_counter()
        W2 = qio.load(cache_path)
        np.asarray(W2.chain.ranks)
        t_build_cache = time.perf_counter() - t0
        del W2
        log(f"build via artifact cache {t_build_cache:.2f}s")
        state = dict(
            psi_host,
            W_re=np.asarray(jnp.real(W.chain.cores)),
            W_im=np.asarray(jnp.imag(W.chain.cores)),
            W_ranks=np.asarray(W.chain.ranks),
            t_enc=t_enc,
            t_build=t_build,
            t_build_cache=t_build_cache,
        )
        np.savez(os.environ["BENCH_STATE"], **state)
        print("SETUP_OK", flush=True)
        return

    elif mode == "tpu-apply":
        # Phase B: fresh process, clean device; upload and time apply+scan.
        data = np.load(os.environ["BENCH_STATE"])
        combine = jax.jit(lambda re, im: (re + 1j * im).astype(jnp.complex64))
        t0 = time.perf_counter()
        psi = ZTMPS(chain=MPS(
            cores=combine(jax.device_put(data["psi_re"], tpu),
                          jax.device_put(data["psi_im"], tpu)),
            ranks=jax.device_put(data["psi_ranks"], tpu),
            amplitude=jax.device_put(np.float32(data["psi_amp"]), tpu),
        ))
        W = PairedSiteMPO(chain=MPO(
            cores=combine(jax.device_put(data["W_re"], tpu),
                          jax.device_put(data["W_im"], tpu)),
            ranks=jax.device_put(data["W_ranks"], tpu),
        ))
        jax.block_until_ready(W.chain.cores)
        t_ship = time.perf_counter() - t0
        W, psi = maybe_tight(W, psi)
        re, im = step(W, psi, configs)  # warmup
        np.asarray(re)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            re, im = step(W, psi, configs)
            re_h, im_h = np.asarray(re), np.asarray(im)
            times.append(time.perf_counter() - t0)
        t_apply = float(np.median(times))  # transfer excluded (t_ship)
        emit(n, mode, float(data["t_enc"]), float(data["t_build"]), t_ship,
             t_apply, re_h, im_h, ks, ls, W, readout, setup_device="tpu",
             apply_device="tpu",
             t_build_cache=float(data["t_build_cache"]))
    else:
        # legacy CPU-LAPACK setup for the rsvd/gate configuration: encode +
        # build on host LAPACK, ship split re/im, TPU apply + scan (the
        # round-1 configuration).
        def encode_build_cpu():
            jax.config.update("jax_default_device", cpu)
            x = generate_signal(n, kind="sin_decay", freq=FREQ,
                                decay_rate=DECAY, dtype=jnp.float32)
            t0 = time.perf_counter()
            psi = signal_ztmps(x, method="rsvd", k=50, p=5, q=2, cutoff=CUTOFF,
                               maxdim=CHI)
            jax.block_until_ready(psi.chain.cores)
            t_enc = time.perf_counter() - t0
            t0 = time.perf_counter()
            W = build_zt_mpo(n, WR, cutoff=CUTOFF, maxdim=CHI, chi=CHI,
                             dtype=np.complex64, chi_work=CHI)
            jax.block_until_ready(W.chain.cores)
            t_build = time.perf_counter() - t0
            # materialize numpy WHILE the CPU pin is active (complex ops on
            # uncommitted arrays would otherwise dispatch on the TPU)
            host = (
                np.asarray(psi.chain.cores.real, np.float32),
                np.asarray(psi.chain.cores.imag, np.float32),
                np.asarray(psi.chain.ranks, np.int32),
                np.float32(psi.chain.amplitude),
                np.asarray(W.chain.cores.real, np.float32),
                np.asarray(W.chain.cores.imag, np.float32),
                np.asarray(W.chain.ranks, np.int32),
            )
            jax.config.update("jax_default_device", None)
            return host, t_enc, t_build

        combine = jax.jit(lambda re, im: (re + 1j * im).astype(jnp.complex64))

        def ship(host):
            p_re, p_im, p_ranks, p_amp, w_re, w_im, w_ranks = host
            psi = ZTMPS(chain=MPS(
                cores=combine(jax.device_put(p_re, tpu),
                              jax.device_put(p_im, tpu)),
                ranks=jax.device_put(p_ranks, tpu),
                amplitude=jax.device_put(p_amp, tpu),
            ))
            W = PairedSiteMPO(chain=MPO(
                cores=combine(jax.device_put(w_re, tpu),
                              jax.device_put(w_im, tpu)),
                ranks=jax.device_put(w_ranks, tpu),
            ))
            jax.block_until_ready(W.chain.cores)
            return psi, W

        t0 = time.perf_counter()
        host, t_enc, t_build = encode_build_cpu()
        psi, W = ship(host)
        W, psi = maybe_tight(W, psi)
        re, im = step(W, psi, configs)
        np.asarray(re)
        log(f"warmup total (incl. compiles) {time.perf_counter() - t0:.2f}s "
            f"(encode {t_enc:.2f} build {t_build:.2f})")

        # warm setup timing (second pass), then ship once and time the step
        # alone: interleaving re-setup between steps retriggers a retrace
        # of the jitted step under the toggled default-device context (one
        # ~6 min Mosaic/XLA recompile per iteration at n=30)
        host, t_enc, t_build = encode_build_cpu()
        t1 = time.perf_counter()
        psi, W = ship(host)
        t_ship = time.perf_counter() - t1
        W, psi = maybe_tight(W, psi)
        times = []
        for _ in range(3):
            t1 = time.perf_counter()
            re, im = step(W, psi, configs)
            re_h, im_h = np.asarray(re), np.asarray(im)
            times.append(time.perf_counter() - t1)
        t_apply = float(np.median(times))
        emit(n, mode, t_enc, t_build, t_ship, t_apply, re_h, im_h, ks, ls,
             W, readout, setup_device="cpu", apply_device="tpu")


def _run_child(n, mode, timeout=None):
    if timeout is None:
        # The relay can wedge MID-run (observed: probe OK, then the child
        # hangs on the first transfer): TPU-mode children get a bounded
        # wait so the cpu fallback still runs within the driver's budget.
        # Host-only children keep the long leash (cold x64 compiles).
        timeout = 4500 if mode == "cpu" else 1800
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(n), mode],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=os.environ,
        )
        sys.stderr.write(proc.stderr[-8000:])
        return proc
    except subprocess.TimeoutExpired:
        log(f"child ({mode}) timed out")
        return None


def _tpu_alive() -> bool:
    """90 s probe subprocess: a wedged relay HANGS jax.devices(), so the
    probe must be killable from outside."""
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jax.jit(lambda a: (a * a).sum())(jnp.arange(8.0));"
        "print('PROBE_OK', float(x))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=90, env=os.environ,
        )
        return "PROBE_OK" in (proc.stdout or "")
    except subprocess.TimeoutExpired:
        return False


def main():
    sizes = (int(os.environ.get("BENCH_N", "30")), 26, 22, 16)
    os.environ.setdefault("BENCH_STATE", "/tmp/qilaplace_bench_state.npz")
    host_based = ENCODE == "cross" and BUILD == "analytic"
    tpu_ok = _tpu_alive()
    log(f"tpu probe: {'alive' if tpu_ok else 'DOWN (wedged or offline)'}")
    for n in sizes:
        if host_based:
            default_modes = "tpu,cpu"
        else:
            # rsvd encode at n >= 28: the device arena cannot hold the
            # encode AND the apply in one process — use the split mode
            default_modes = "tpu2,cpu" if n >= 28 else "tpu,cpu"
        modes = os.environ.get("BENCH_MODES", default_modes).split(",")
        for mode in modes:
            needs_tpu = mode != "cpu" or not host_based
            if needs_tpu and not tpu_ok:
                log(f"skipping mode {mode} (tpu down)")
                continue
            log(f"=== bench attempt n={n} mode={mode}")
            if mode in ("tpu2", "tpu-split"):
                setup = _run_child(n, "tpu-setup")
                if setup is None or "SETUP_OK" not in (setup.stdout or ""):
                    log("tpu setup phase failed; retrying once (warm cache)")
                    setup = _run_child(n, "tpu-setup")
                if setup is None or "SETUP_OK" not in (setup.stdout or ""):
                    log("tpu setup phase failed twice")
                    continue
                proc = _run_child(n, "tpu-apply")
            else:
                proc = _run_child(n, mode)
            if proc is None:
                continue
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    print(line, flush=True)
                    return
            log(f"child exited {proc.returncode} without result")
            time.sleep(15)
    raise SystemExit("bench failed at all sizes")


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        main()
