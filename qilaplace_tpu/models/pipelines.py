"""End-to-end transform pipelines — the "model families" of this framework.

Each pipeline bundles (encode -> build MPO -> apply -> read out) with jitted
hot paths, mirroring the reference's tutorial workflows
(docs/src/tutorials/{dft,dt,zt}.jl) as first-class objects:

* ``QFTPipeline`` — spectrum analysis (QFT / DFT);
* ``DTPipeline``  — damping transform on the paired register;
* ``ZTPipeline``  — full z-transform + coarse-to-fine pole identification.

The MPO is built once per (n, parameter) and cached; apply/readout are
jit-compiled per shape and reused across calls — the pattern that turns the
reference's 1e4-1e5 serial coefficient reads into one device program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from qilaplace_tpu.core.mps import coefficient_batch
from qilaplace_tpu.ops.apply import apply
from qilaplace_tpu.scan.pole_scan import (
    chi_grid,
    coarse_to_fine_pole_search,
    pole_scan,
)
from qilaplace_tpu.signals.encode import signal_mps, signal_ztmps
from qilaplace_tpu.transforms.dt import build_dt_mpo
from qilaplace_tpu.transforms.qft import build_qft_mpo
from qilaplace_tpu.transforms.zt import zt_mpo
from qilaplace_tpu.utils.bits import jnp_int_to_bits, paired_config_from_kl


class QFTPipeline:
    """Signal -> frequency-domain MPS -> coefficient readout."""

    def __init__(self, n: int, *, chi: int = 64, cutoff: float = 1e-12,
                 build_cutoff: float = 1e-14, dtype=jnp.complex64):
        self.n = n
        self.chi = chi
        self.cutoff = cutoff
        self.mpo = build_qft_mpo(n, cutoff=build_cutoff, dtype=dtype)
        self._apply = jax.jit(
            lambda W, psi: apply(W, psi, maxdim=chi, cutoff=cutoff)
        )
        self._read = jax.jit(coefficient_batch)

    def encode(self, x, *, method: str = "svd", **kw):
        return signal_mps(x, method=method, cutoff=self.cutoff,
                          maxdim=self.chi, chi=self.chi, **kw)

    def forward(self, psi):
        return self._apply(self.mpo, psi)

    def spectrum(self, psi_out, freqs):
        """Coefficients at integer frequency indices ``freqs`` (natural
        order; the bit-reversal is part of the readout configs)."""
        freqs = jnp.asarray(freqs)
        configs = jnp_int_to_bits(freqs, self.n, order="lsb")
        return self._read(psi_out, configs)

    def __call__(self, x, freqs):
        return self.spectrum(self.forward(self.encode(x)), freqs)


class DTPipeline:
    """Paired-register damping transform."""

    def __init__(self, n: int, wr: float, *, chi: int = 64,
                 cutoff: float = 1e-12, build_cutoff: float = 1e-14,
                 dtype=jnp.complex64):
        self.n = n
        self.wr = wr
        self.chi = chi
        self.cutoff = cutoff
        self.mpo = build_dt_mpo(n, wr, cutoff=build_cutoff, dtype=dtype)
        self._apply = jax.jit(
            lambda W, psi: apply(W, psi, maxdim=chi, cutoff=cutoff)
        )
        self._read = jax.jit(coefficient_batch)

    def encode(self, x, **kw):
        return signal_ztmps(x, cutoff=self.cutoff, maxdim=self.chi,
                            chi=self.chi, **kw)

    def forward(self, psi_z):
        return self._apply(self.mpo, psi_z)

    def coefficients(self, psi_out, ks, js):
        """Damped coefficients at main-register index k, copy-register j."""
        # DT output: main register holds k LSB-first; the copy register still
        # carries the original (MSB-first) input index j
        kb = jnp_int_to_bits(jnp.asarray(ks), self.n, order="lsb")
        jb = jnp_int_to_bits(jnp.asarray(js), self.n, order="msb")
        from qilaplace_tpu.utils.bits import jnp_interleave_bits

        configs = jnp_interleave_bits(kb, jb)
        return self._read(psi_out, configs)


class ZTPipeline:
    """Full z-transform with pole identification.

    Production defaults are the bench-grade fast path (round-3 verdict #1):
    cross-interpolation encode (host f64, reads O(n r^2) signal entries —
    callables with an ``n_bits`` attribute encode without materializing
    2^n samples), the analytic rail-cross operator builder behind a
    persistent per-(wr, n, cutoff) artifact cache, and the direct
    <config|W|psi> readout whose roundoff stays relative to the path
    product. ``engine="gate"`` restores the reference-parity layer fold.
    """

    def __init__(self, n: int, *, chi: int = 128, cutoff: float = 1e-12,
                 build_cutoff: float = 1e-12, dtype=jnp.complex64,
                 engine: str = "analytic", readout: str = "auto",
                 cache: bool = True, cache_dir: str | None = None):
        self.n = n
        self.chi = chi
        self.cutoff = cutoff
        self.build_cutoff = build_cutoff
        self.dtype = dtype
        self.engine = engine
        self.readout = readout
        self.cache = cache
        self.cache_dir = cache_dir
        self._mpo_cache: dict = {}

    def mpo(self, wr: float):
        if wr not in self._mpo_cache:
            self._mpo_cache[wr] = zt_mpo(
                self.n, wr, engine=self.engine, cutoff=self.build_cutoff,
                maxdim=self.chi, chi=self.chi, dtype=self.dtype,
                cache=self.cache, cache_dir=self.cache_dir,
            )
        return self._mpo_cache[wr]

    def encode(self, x, *, method: str = "cross", **kw):
        if method == "rsvd":
            kw.setdefault("k", 50)
            kw.setdefault("p", 5)
            kw.setdefault("q", 2)
        return signal_ztmps(x, method=method, cutoff=self.cutoff,
                            maxdim=self.chi, chi=self.chi, **kw)

    def forward(self, psi_z, wr: float):
        return apply(self.mpo(wr), psi_z, maxdim=self.chi, cutoff=self.cutoff)

    def chi_grid(self, psi_out, ks, ls):
        return chi_grid(psi_out, ks, ls)

    def chi_grid_direct(self, psi_z, ks, ls, *, wr):
        """Direct <config|W|psi> grid — no intermediate product state."""
        from qilaplace_tpu.scan.pole_scan import chi_grid_direct, tighten

        return chi_grid_direct(tighten(self.mpo(wr)), tighten(psi_z), ks, ls)

    def scan(self, psi_out, ks, ls, *, wr):
        return pole_scan(psi_out, ks, ls, wr=wr)

    def find_poles(self, psi_z, **kw):
        kw.setdefault("cutoff", self.build_cutoff)
        kw.setdefault("maxdim", self.chi)
        kw.setdefault("engine", self.engine)
        kw.setdefault("readout", self.readout)
        kw.setdefault("cache", self.cache)
        kw.setdefault("cache_dir", self.cache_dir)
        return coarse_to_fine_pole_search(psi_z, **kw)
