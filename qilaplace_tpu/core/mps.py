"""Static-shape MPS containers and sweep primitives.

Design (vs reference src/mps.jl):

* ``MPS`` stores all site tensors in one padded stack ``cores[n, chi, 2, chi]``
  plus a rank vector ``ranks[n+1]`` (``ranks[0] == ranks[n] == 1``). Entries
  outside the valid ``ranks[i] x 2 x ranks[i+1]`` block of core ``i`` are
  exactly zero, so contractions over padded axes are exact and no Index
  bookkeeping (reference update_site!/update_bond!, src/mps.jl:483-605) is
  needed — positions are the wiring.
* The reference's ``ZTMPS`` (paired register of PairCores, src/mps.jl:98-117)
  funnels every operation through its interleaved 2n-site form
  (src/mps.jl:421-472); here the 2n-site chain IS the storage and ``ZTMPS``
  is a thin view (main register = even sites, copy register = odd sites).
* ``amplitude`` carries the original signal 2-norm (src/mps.jl:66,74).
* Sweeps (canonicalize / compress) are ``lax.scan`` programs over the core
  stack; truncation is mask-based (ops/truncation.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from qilaplace_tpu.ops.truncation import svd_split
from qilaplace_tpu.utils.config import bucket_for
from qilaplace_tpu.utils.config import highest_precision


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cores", "ranks", "amplitude"],
    meta_fields=[],
)
@dataclasses.dataclass
class MPS:
    """Padded matrix-product state.

    cores:     [n, chi, 2, chi] (complex or real)
    ranks:     [n+1] int32, valid bond dimensions; ranks[0] == ranks[n] == 1
    amplitude: scalar — original signal 2-norm (the tensor data is unit-norm
               after encoding/compression).
    """

    cores: jax.Array
    ranks: jax.Array
    amplitude: jax.Array

    @property
    def n(self) -> int:
        return self.cores.shape[0]

    @property
    def chi(self) -> int:
        return self.cores.shape[1]

    @property
    def dtype(self):
        return self.cores.dtype

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, config):
        if isinstance(config, tuple):
            config = list(config)
        return coefficient(self, jnp.asarray(config))

    @staticmethod
    def from_core_list(core_list, amplitude=1.0, chi: int | None = None) -> "MPS":
        """Stack variable-size cores ``[l_i, 2, r_i]`` into a padded MPS."""
        n = len(core_list)
        ranks = [1] + [c.shape[2] for c in core_list]
        if core_list[0].shape[0] != 1 or core_list[-1].shape[2] != 1:
            raise ValueError("edge cores must have boundary bond dimension 1")
        if chi is None:
            chi = bucket_for(max(ranks))
        dtype = np.result_type(*[np.asarray(c).dtype for c in core_list])
        cores = np.zeros((n, chi, 2, chi), dtype=dtype)
        for i, c in enumerate(core_list):
            l, s, r = c.shape
            if s != 2:
                raise ValueError("site dimension must be 2")
            if l != ranks[i] or l > chi or r > chi:
                raise ValueError("core shapes inconsistent with ranks/chi")
            cores[i, :l, :, :r] = c
        return MPS(
            cores=jnp.asarray(cores),
            ranks=jnp.asarray(ranks, dtype=jnp.int32),
            amplitude=jnp.asarray(amplitude),
        )

    def to_core_list(self):
        """Concrete (non-traced) unpadded cores, for tests and interop."""
        cores = np.asarray(self.cores)
        ranks = np.asarray(self.ranks)
        return [
            cores[i, : ranks[i], :, : ranks[i + 1]] for i in range(self.n)
        ]

    @staticmethod
    def empty(n: int, *, chi: int = 8, dtype=jnp.complex64,
              amplitude=1.0) -> "MPS":
        """Zero-initialized n-site chain with all bonds rank 1 — the analog
        of the reference's bare ``SignalMPS(n)`` constructor
        (src/mps.jl:142-146: fresh Index wiring, zero ITensors), ready to be
        filled site by site."""
        if n < 1:
            raise ValueError("MPS.empty: need n >= 1")
        return MPS(
            cores=jnp.zeros((n, chi, 2, chi), dtype=dtype),
            ranks=jnp.ones((n + 1,), dtype=jnp.int32),
            amplitude=jnp.asarray(amplitude),
        )


# SignalMPS is the single-register MPS (reference src/mps.jl:70-79).
SignalMPS = MPS


@partial(
    jax.tree_util.register_dataclass, data_fields=["chain"], meta_fields=[]
)
@dataclasses.dataclass
class ZTMPS:
    """Paired-register MPS stored natively as its interleaved 2n-site chain.

    Site layout: [main_1, copy_1, main_2, copy_2, ...]; the reference's
    bonds_copy are the odd chain bonds and bonds_main the even ones
    (reference src/mps.jl:421-444).
    """

    chain: MPS

    @property
    def n(self) -> int:
        return self.chain.n // 2

    @property
    def amplitude(self) -> jax.Array:
        return self.chain.amplitude

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, config):
        if isinstance(config, tuple):
            config = list(config)
        return coefficient(self, jnp.asarray(config))

    @staticmethod
    def empty(n: int, *, chi: int = 8, dtype=jnp.complex64,
              amplitude=1.0) -> "ZTMPS":
        """Zero-initialized paired-register state (2n-site chain, all bonds
        rank 1) — the analog of the reference's bare ``ZTMPS(n)``
        constructor (src/mps.jl:180-184)."""
        return ZTMPS(
            chain=MPS.empty(2 * n, chi=chi, dtype=dtype, amplitude=amplitude)
        )


def _chain(psi) -> MPS:
    return psi.chain if isinstance(psi, ZTMPS) else psi


def _rewrap(psi, chain: MPS):
    return ZTMPS(chain=chain) if isinstance(psi, ZTMPS) else chain


def siteindices(psi):
    """Positional site index lists ``(main, copy)`` (API parity with
    reference src/mps.jl:345-346; indices are positions in the chain)."""
    if isinstance(psi, ZTMPS):
        n = psi.n
        return (list(range(0, 2 * n, 2)), list(range(1, 2 * n, 2)))
    return (list(range(psi.n)), [])


def bondindices(psi):
    """Positional bond index lists ``(main, copy)``: chain bond b sits between
    chain sites b and b+1 (reference src/mps.jl:355-356)."""
    if isinstance(psi, ZTMPS):
        n = psi.n
        return (list(range(1, 2 * n - 1, 2)), list(range(0, 2 * n, 2)))
    return (list(range(psi.n - 1)), [])


def nsite(psi) -> int:
    """Deprecated alias for ``len(psi)`` (reference src/mps.jl:334)."""
    import warnings

    warnings.warn("nsite is deprecated; use len(psi)", DeprecationWarning,
                  stacklevel=2)
    return len(psi)


def validate(obj, *, atol: float | None = None) -> None:
    """Structural validation on concrete containers — the analog of the
    reference's check_mps/check_ztmps/check_singlesitempo/check_pairedsitempo
    (src/mps.jl:188-330, src/mpo.jl:150-372), whose Index-wiring invariants
    are positional here. Accepts MPS, ZTMPS, MPO and PairedSiteMPO. Checks:
    ranks within [1, chi], boundary ranks 1, padding (numerically) zero
    outside the valid blocks, paired chains even-length (the main/copy
    disjointness and alternating bond wiring of mpo.jl:251-366 hold by
    construction of the interleaved layout). Raises ValueError on violation.
    Concrete (non-traced) arrays only.

    ``atol`` defaults to 64 * eps * max|core| — padded entries are exact
    zeros analytically, but LAPACK factors of chains whose padding was
    itself produced numerically leak O(eps)-scale residue; pass 0.0 to
    demand bit-exact padding."""
    from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO, _mpo_chain

    if isinstance(obj, (MPO, PairedSiteMPO)):
        m = _mpo_chain(obj)
        paired = isinstance(obj, PairedSiteMPO)
    else:
        m = _chain(obj)
        paired = isinstance(obj, ZTMPS)
    cores = np.asarray(m.cores)
    ranks = np.asarray(m.ranks)
    n, chi = m.n, m.chi
    if atol is None:
        scale = float(np.abs(cores).max()) if cores.size else 0.0
        atol = 64.0 * float(np.finfo(cores.real.dtype).eps) * scale
    if paired and n % 2 != 0:
        raise ValueError(
            "validate: paired-register chains must have an even number of sites"
        )
    if ranks.shape != (n + 1,):
        raise ValueError(f"validate: ranks must have length n+1={n + 1}")
    if ranks[0] != 1 or ranks[n] != 1:
        raise ValueError("validate: boundary ranks must be 1")
    if (ranks < 1).any() or (ranks > chi).any():
        raise ValueError("validate: ranks out of [1, chi]")
    for i in range(n):
        c = np.abs(cores[i])
        pad = max(
            c[ranks[i]:].max() if ranks[i] < chi else 0.0,
            c[..., ranks[i + 1]:].max() if ranks[i + 1] < chi else 0.0,
        )
        if pad > atol:
            raise ValueError(
                f"validate: nonzero padding at site {i} (max {pad:.2e})"
            )


# ------------------------------ dense readout ------------------------------

@highest_precision
def mps_to_vector(psi, *, reverse: bool = False) -> jax.Array:
    """Full dense vector (test/small-n only: materializes 2^n entries).

    reverse=False: natural order (site 1 = MSB, matching the input signal,
    reference src/mps.jl:716-728). reverse=True: raw bit-reversed order (the
    native output order of QFT/DT/zT).
    """
    m = _chain(psi)
    n = m.n
    T = m.cores[0][0]  # [2, chi]
    for i in range(1, n):
        T = jnp.tensordot(T, m.cores[i], axes=[[T.ndim - 1], [0]])
    T = T[..., 0]  # [2]*n, axis i = site i (MSB-first flattening)
    if reverse:
        T = jnp.transpose(T, tuple(range(n - 1, -1, -1)))
    return T.reshape(-1) * m.amplitude


@highest_precision
def norm(psi) -> jax.Array:
    """Euclidean norm sqrt(<psi|psi>) of the tensor data (excludes the stored
    amplitude, like reference src/mps.jl:754-771)."""
    m = _chain(psi)
    chi = m.chi
    E0 = jnp.zeros((chi, chi), dtype=m.dtype).at[0, 0].set(1.0)

    def step(E, core):
        E = jnp.einsum("ab,asr,bsq->rq", E, jnp.conj(core), core)
        return E, None

    E, _ = jax.lax.scan(step, E0, m.cores)
    return jnp.sqrt(jnp.abs(E[0, 0]))


# ------------------------------- coefficient -------------------------------

def _parse_config(psi, config):
    """Accept every configuration spec of the reference
    (src/mps.jl:609-685): int array/list/tuple, bit strings like "0101" or
    "[1,0,1,0]", or a non-negative integer read as big-endian n bits."""
    n = _chain(psi).n
    if isinstance(config, str):
        stripped = config.strip().strip("[](){}")
        if not stripped:
            raise ValueError("coefficient: configuration string is empty")
        if any(c in stripped for c in ", \t"):
            bits = [int(t) for t in stripped.replace(",", " ").split()]
        else:
            if not set(stripped) <= {"0", "1"}:
                raise ValueError(
                    "coefficient: bit strings may contain only '0' or '1'"
                )
            bits = [int(c) for c in stripped]
        return jnp.asarray(bits)
    if isinstance(config, (int, np.integer)):
        if config < 0:
            raise ValueError("coefficient: integer configuration must be >= 0")
        if config >> n:
            raise ValueError(
                f"coefficient: integer {config} requires more than {n} bits"
            )
        return jnp.asarray([(config >> (n - 1 - i)) & 1 for i in range(n)])
    if isinstance(config, tuple):
        config = list(config)
    return jnp.asarray(config)


@highest_precision
def coefficient(psi, config) -> jax.Array:
    """Amplitude <config|psi> for a zero-based bit configuration.

    ``config``: int array of length n (chain length for ZTMPS — use
    interleaved main/copy bits, reference docs/src/tutorials/zt.jl:59-67),
    a bit string like "0101", or a big-endian integer.
    A chain of chi x chi matvecs via ``lax.scan``
    (reference src/mps.jl:669-690).
    """
    m = _chain(psi)
    config = _parse_config(psi, config)
    chi = m.chi
    v0 = jnp.zeros((chi,), dtype=m.dtype).at[0].set(1.0)

    def step(v, inp):
        core, bit = inp
        A = jnp.where(bit == 0, core[:, 0, :], core[:, 1, :])
        return v @ A, None

    v, _ = jax.lax.scan(step, v0, (m.cores, config))
    return m.amplitude * v[0]


@highest_precision
def coefficient_batch(psi, configs) -> jax.Array:
    """Vectorized coefficient: ``configs`` [B, n] -> [B] amplitudes.

    This is the TPU replacement for the reference's serial pole-scan loops
    (docs/src/tutorials/zt.jl:307-316): one batched matmul chain instead of
    B independent contractions.
    """
    m = _chain(psi)
    configs = jnp.asarray(configs)
    B = configs.shape[0]
    chi = m.chi
    v0 = jnp.zeros((B, chi), dtype=m.dtype).at[:, 0].set(1.0)

    def step(v, inp):
        core, bits = inp  # core [chi,2,chi], bits [B]
        # Select per-row site matrix then one batched GEMM on the MXU.
        A0 = v @ core[:, 0, :]
        A1 = v @ core[:, 1, :]
        v = jnp.where((bits == 0)[:, None], A0, A1)
        return v, None

    v, _ = jax.lax.scan(step, v0, (m.cores, configs.T))
    return m.amplitude * v[:, 0]


# ------------------------------ canonicalize -------------------------------

def _sweep_right(cores, ranks, *, cutoff, maxdim, start: int, stop: int):
    """Left-orthogonalize sites [start, stop): SVD-split each core, absorb the
    remainder into the next site. Returns (cores, ranks)."""
    n, chi = cores.shape[0], cores.shape[1]
    maxdim = min(maxdim, chi)
    if stop - start < 1:
        return cores, ranks

    seg = cores[start:stop]

    def step(carry, core):
        R, _ = carry
        core = jnp.einsum("ab,bsr->asr", R, core)
        p = core.shape[1]
        M = core.reshape(chi * p, chi)
        Q, R2, rank = svd_split(
            M, cutoff=cutoff, maxdim=maxdim, absorb="right", out_dim=chi
        )
        return (R2, rank), (Q.reshape(chi, p, chi), rank)

    R0 = jnp.eye(chi, dtype=cores.dtype)
    (Rf, _), (new_seg, seg_ranks) = jax.lax.scan(step, (R0, jnp.int32(0)), seg)
    cores = cores.at[start:stop].set(new_seg)
    cores = cores.at[stop].set(jnp.einsum("ab,bsr->asr", Rf, cores[stop]))
    ranks = ranks.at[start + 1 : stop + 1].set(seg_ranks)
    return cores, ranks


def _sweep_left(cores, ranks, *, cutoff, maxdim, start: int, stop: int):
    """Right-orthogonalize sites (stop, start] sweeping right-to-left; the
    remainder is absorbed into site stop."""
    n, chi = cores.shape[0], cores.shape[1]
    maxdim = min(maxdim, chi)
    if start - stop < 1:
        return cores, ranks

    seg = cores[stop + 1 : start + 1]

    def step(carry, core):
        L, _ = carry
        core = jnp.einsum("lsb,ba->lsa", core, L)
        p = core.shape[1]
        M = core.reshape(chi, p * chi)
        L2, Q, rank = svd_split(
            M, cutoff=cutoff, maxdim=maxdim, absorb="left", out_dim=chi
        )
        return (L2, rank), (Q.reshape(chi, p, chi), rank)

    L0 = jnp.eye(chi, dtype=cores.dtype)
    (Lf, _), (new_seg, seg_ranks) = jax.lax.scan(
        step, (L0, jnp.int32(0)), seg, reverse=True
    )
    cores = cores.at[stop + 1 : start + 1].set(new_seg)
    cores = cores.at[stop].set(jnp.einsum("lsb,ba->lsa", cores[stop], Lf))
    ranks = ranks.at[stop + 1 : start + 1].set(seg_ranks)
    return cores, ranks


@highest_precision
def canonicalize(
    psi,
    direction: str,
    *,
    center: int | None = None,
    cutoff: float = 1e-12,
    maxdim: int | None = None,
):
    """Bring the MPS into canonical form (reference src/mps.jl:787-896).

    direction='right': left-canonical up to ``center`` (default last site);
    direction='left':  right-canonical down to ``center`` (default site 0).
    ``center`` is a static Python int (0-based). Truncation uses the same
    SVD-with-cutoff semantics as the reference's ``factorize`` calls.
    """
    m = _chain(psi)
    n, chi = m.n, m.chi
    if maxdim is None:
        maxdim = chi
    if direction == "right":
        c = n - 1 if center is None else center
        cores, ranks = _sweep_right(
            m.cores, m.ranks, cutoff=cutoff, maxdim=maxdim, start=0, stop=c
        )
    elif direction == "left":
        c = 0 if center is None else center
        cores, ranks = _sweep_left(
            m.cores, m.ranks, cutoff=cutoff, maxdim=maxdim, start=n - 1, stop=c
        )
    else:
        raise ValueError("direction must be 'right' or 'left'")
    return _rewrap(psi, MPS(cores=cores, ranks=ranks, amplitude=m.amplitude))


# -------------------------------- compress ---------------------------------

def _two_site_sweep(cores, ranks, *, cutoff, maxdim, reverse: bool):
    """One truncating two-site SVD sweep (L->R if not reverse, else R->L).

    Generic in the physical dimension p (p=2 for MPS chains, p=4 for MPO
    chains viewed with fused (s_out, s_in) legs)."""
    n, chi, p = cores.shape[0], cores.shape[1], cores.shape[2]
    maxdim = min(maxdim, chi)

    if not reverse:
        def step(carry, core_next):
            left, _ = carry
            T = jnp.einsum("lsa,atr->lstr", left, core_next)
            M = T.reshape(chi * p, p * chi)
            L, R, rank = svd_split(
                M, cutoff=cutoff, maxdim=maxdim, absorb="right", out_dim=chi
            )
            return (R.reshape(chi, p, chi), rank), (L.reshape(chi, p, chi), rank)

        (last, _), (new_cores, bond_ranks) = jax.lax.scan(
            step, (cores[0], jnp.int32(0)), cores[1:]
        )
        cores = jnp.concatenate([new_cores, last[None]], axis=0)
        ranks = ranks.at[1:n].set(bond_ranks)
    else:
        def step(carry, core_prev):
            right, _ = carry
            T = jnp.einsum("lsa,atr->lstr", core_prev, right)
            M = T.reshape(chi * p, p * chi)
            L, R, rank = svd_split(
                M, cutoff=cutoff, maxdim=maxdim, absorb="left", out_dim=chi
            )
            return (L.reshape(chi, p, chi), rank), (R.reshape(chi, p, chi), rank)

        (first, _), (new_cores, bond_ranks) = jax.lax.scan(
            step, (cores[n - 1], jnp.int32(0)), cores[: n - 1], reverse=True
        )
        cores = jnp.concatenate([first[None], new_cores], axis=0)
        ranks = ranks.at[1:n].set(bond_ranks)
    return cores, ranks


@highest_precision
def compress(psi, *, maxdim: int | None = None, tol: float = 1e-12, sweeps: int = 1):
    """Truncate bond dimensions via alternating two-site SVD sweeps and
    renormalize, absorbing the norm into ``amplitude``
    (reference src/mps.jl:913-998; per-bond cutoff budget at :920)."""
    m = _chain(psi)
    n, chi = m.n, m.chi
    if n < 2:
        raise ValueError("compress: MPS must have at least 2 sites")
    if maxdim is None:
        maxdim = chi
    cutoff = tol**2 / ((n - 1) * sweeps)

    out = canonicalize(m, "left")
    cores, ranks = out.cores, out.ranks
    for _ in range(sweeps):
        cores, ranks = _two_site_sweep(
            cores, ranks, cutoff=cutoff, maxdim=maxdim, reverse=False
        )
        cores, ranks = _two_site_sweep(
            cores, ranks, cutoff=cutoff, maxdim=maxdim, reverse=True
        )
    out = canonicalize(
        MPS(cores=cores, ranks=ranks, amplitude=m.amplitude), "left"
    )

    nrm = norm(out)
    safe = jnp.where(nrm == 0, 1.0, nrm)
    cores = out.cores.at[0].multiply(1.0 / safe.astype(out.dtype))
    amplitude = jnp.where(nrm == 0, m.amplitude, m.amplitude * nrm)
    return _rewrap(
        psi, MPS(cores=cores, ranks=out.ranks, amplitude=amplitude)
    )


# ------------------------------ chi repadding -------------------------------

def _fetchable(x) -> bool:
    """True when ``x`` can be brought to host for checking: numpy, or a
    concrete jax array on a CPU device (the tunneled TPU backend cannot
    transfer complex arrays at all — see CLAUDE.md)."""
    if isinstance(x, np.ndarray):
        return True
    if isinstance(x, jax.core.Tracer):
        return False
    if isinstance(x, jax.Array):
        try:
            return all(d.platform == "cpu" for d in x.devices())
        except Exception:
            return False
    return False


def _check_shrink(cores, ranks, chi_new: int, what: str) -> None:
    """Concrete-input guard for repad shrinks: the data being sliced away
    must be zero and ranks must fit. Traced (and non-CPU-resident) inputs
    skip the check — callers must guarantee the leading-block precondition,
    e.g. right after a truncating sweep with maxdim <= chi_new."""
    if _fetchable(ranks):
        r = np.asarray(ranks)
        if r.max() > chi_new:
            raise ValueError(
                f"{what}: cannot shrink to chi={chi_new}; max rank is {r.max()}"
            )
    if not _fetchable(cores):
        return
    c = np.asarray(cores)
    sliced = max(
        np.abs(c[:, chi_new:]).max(initial=0.0),
        np.abs(c[..., chi_new:]).max(initial=0.0),
    )
    # Sweeps can leave sub-roundoff residue (singular-value junk ~1e-40 times
    # O(1) factor columns) in the padding; only true data counts.
    scale = np.abs(c).max(initial=0.0)
    if sliced > 64 * np.finfo(c.real.dtype).eps * scale:
        raise ValueError(
            f"{what}: shrinking to chi={chi_new} would discard nonzero data "
            f"(max |entry| {sliced:.2e}) — valid data is not in the leading "
            "block; run a truncating sweep first"
        )


def repad(psi, chi_new: int):
    """Re-pad all bonds to a new static bucket. Shrinking requires the valid
    data to sit in the leading chi_new block (checked on concrete inputs;
    traced callers must guarantee it, e.g. right after a compress with
    maxdim <= chi_new)."""
    m = _chain(psi)
    n, chi = m.n, m.chi
    if chi_new == chi:
        return psi
    if chi_new > chi:
        pad = chi_new - chi
        cores = jnp.pad(m.cores, ((0, 0), (0, pad), (0, 0), (0, pad)))
    else:
        _check_shrink(m.cores, m.ranks, chi_new, "repad")
        cores = m.cores[:, :chi_new, :, :chi_new]
    ranks = jnp.minimum(m.ranks, chi_new)
    return _rewrap(psi, MPS(cores=cores, ranks=ranks, amplitude=m.amplitude))
