"""First-class pole-scan API.

The reference ships this workflow as tutorial code
(docs/src/tutorials/zt.jl:296-411): scan chi(k, l) on coarse-to-fine grids in
the z-plane and locate poles as |chi| peaks. There the scans are serial Julia
loops over 1e4-1e5 individual coefficient contractions; here every grid is a
single vmapped ``lax.scan`` device program (core.mps.coefficient_batch).

Coordinate conventions (reference docs/src/tutorials/zt.jl:170-217):
    s(k, l) = (wr*k + i*wi*l) / N,   z(k, l) = e^{-s(k, l)},
    chi(k, l) read out at interleaved LSB-first (k, l) bits.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from qilaplace_tpu.core.mps import ZTMPS, coefficient_batch
from qilaplace_tpu.ops.apply import apply, apply_coefficient_batch
from qilaplace_tpu.transforms.zt import zt_mpo
from qilaplace_tpu.utils.bits import paired_config_from_kl

TWO_PI = 2.0 * jnp.pi

# jitted readout entry points: repeated grids of the same shape (every scan
# stage of every search) reuse the compiled program instead of re-tracing
_read_batch = jax.jit(coefficient_batch)
_read_direct = jax.jit(apply_coefficient_batch)


@jax.jit
def _read_direct_fused(W, psi, configs):
    from qilaplace_tpu.ops.apply import zipper_chain
    from qilaplace_tpu.ops.pallas_kernels import coefficient_batch_pallas

    return coefficient_batch_pallas(zipper_chain(W, psi), configs)


def _direct_vals(W, psi, configs):
    """Direct <config|W|psi> readout, auto-routed: on TPU with an
    MXU/VMEM-friendly effective chain (chi_W * chi_psi <= 256) the
    Kron-fused Pallas zipper is both faster (60 vs 74 ms at n=30) and
    lower-floor (1.3e-6 vs 1.8e-6 rel-peak — the physical sum contracts
    against the state up front); otherwise the factored two-GEMM form."""
    chi_eff = W.chain.chi * psi.chain.chi
    if jax.default_backend() == "tpu" and chi_eff <= 256:
        return _read_direct_fused(W, psi, configs)
    return _read_direct(W, psi, configs)


def _pallas_readout_ok(psi_out) -> bool:
    """True when the fused Pallas readout kernel applies: a real TPU backend
    and a core stack that fits VMEM (split real/imag f32)."""
    chain = psi_out.chain
    vmem_bytes = chain.n * chain.chi * 2 * chain.chi * 4 * 2
    return jax.default_backend() == "tpu" and vmem_bytes <= 32 * 2**20


def chi_grid(psi_out: ZTMPS, ks, ls, *, use_pallas: bool | None = None) -> jax.Array:
    """Sample chi on the outer product of index vectors ``ks`` x ``ls``.

    Returns a [len(ks), len(ls)] complex grid; one batched device program.
    ``use_pallas=None`` (default) routes through the fused VMEM-resident
    Pallas kernel (ops.pallas_kernels) automatically on TPU whenever the
    core stack fits VMEM — it compiles in ~1 s where the XLA scan path takes
    ~50 s and runs the readout chain without HBM round-trips per site.
    Pass False to force the scan path (e.g. for c128 accuracy studies).
    """
    n = psi_out.n
    ks = jnp.asarray(ks)
    ls = jnp.asarray(ls)
    K, L = jnp.meshgrid(ks, ls, indexing="ij")
    configs = paired_config_from_kl(K.reshape(-1), L.reshape(-1), n)
    if use_pallas is None:
        use_pallas = _pallas_readout_ok(psi_out)
    if use_pallas:
        from qilaplace_tpu.ops.pallas_kernels import coefficient_batch_pallas

        vals = coefficient_batch_pallas(psi_out, configs)
    else:
        vals = _read_batch(psi_out, configs)
    return vals.reshape(ks.shape[0], ls.shape[0])


def chi_grid_direct(W, psi_z: ZTMPS, ks, ls) -> jax.Array:
    """Sample chi on ``ks`` x ``ls`` by DIRECT ``<config| W |psi>`` zipper
    contraction — no intermediate truncated product state.

    This is the accuracy-first scan route (see
    :func:`~qilaplace_tpu.ops.apply.apply_coefficient_batch`): the
    apply-then-read route's roundoff lives at the state-norm scale, so
    coefficients orders of magnitude below the norm (everything near a
    pole's floor) inherit an eps*norm/peak relative floor; the direct
    zipper keeps roundoff relative to the running path product. Cost is a
    single ``lax.scan`` of batched MXU GEMMs over the grid.
    """
    n = psi_z.n
    ks = jnp.asarray(ks)
    ls = jnp.asarray(ls)
    K, L = jnp.meshgrid(ks, ls, indexing="ij")
    configs = paired_config_from_kl(K.reshape(-1), L.reshape(-1), n)
    vals = _direct_vals(W, psi_z, configs)
    return vals.reshape(ks.shape[0], ls.shape[0])


def z_from_kl(k, l, n: int, wr, wi=TWO_PI):
    """Map grid indices to the z-plane: z = r e^{-i theta}
    (reference docs/src/tutorials/zt.jl:209-214)."""
    N = 2**n
    r = jnp.exp(-wr * jnp.asarray(k, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) / N)
    theta = wi * jnp.asarray(l, r.dtype) / N
    return r * jnp.cos(theta) - 1j * r * jnp.sin(theta)


def kl_from_z(z, n: int, wr, wi=TWO_PI):
    """Nearest grid indices for a z-plane target
    (reference docs/src/tutorials/zt.jl:355-360, 390-393)."""
    N = 2**n
    r = jnp.abs(z)
    theta = jnp.mod(-jnp.angle(z), TWO_PI)
    k = jnp.clip(jnp.round(-N * jnp.log(r) / wr).astype(jnp.int64), 0, N - 1)
    l = jnp.mod(jnp.round(N * theta / wi).astype(jnp.int64), N)
    return k, l


@dataclasses.dataclass
class ScanResult:
    ks: jax.Array          # [K] row indices
    ls: jax.Array          # [L] column indices
    chi: jax.Array         # [K, L] sampled coefficients
    k_peak: jax.Array      # argmax |chi| row index
    l_peak: jax.Array      # argmax |chi| col index
    z_peak: jax.Array      # z at the peak
    wr: float
    wi: float


def pole_scan(psi_out: ZTMPS, ks, ls, *, wr, wi=TWO_PI) -> ScanResult:
    """Evaluate |chi| on a (k, l) grid and report the peak."""
    n = psi_out.n
    ks = jnp.asarray(ks)
    ls = jnp.asarray(ls)
    chi = chi_grid(psi_out, ks, ls)
    mag = jnp.abs(chi)
    flat = jnp.argmax(mag)
    i, j = jnp.unravel_index(flat, mag.shape)
    k_peak, l_peak = ks[i], ls[j]
    return ScanResult(
        ks=ks,
        ls=ls,
        chi=chi,
        k_peak=k_peak,
        l_peak=l_peak,
        z_peak=z_from_kl(k_peak, l_peak, n, wr, wi),
        wr=float(wr),
        wi=float(wi),
    )


@dataclasses.dataclass
class PoleSearchResult:
    coarse: ScanResult
    fine: ScanResult
    superfine: ScanResult

    @property
    def z_pole(self):
        return self.superfine.z_peak


def _tight_bucket(ranks, chi: int) -> int:
    """Smallest bucket holding the realized ranks (the direct-readout
    zipper's GEMMs scale with the PAD, not the rank): multiples of 8, plus
    a 4-bucket for the very-low-rank states the cross encoder produces on
    closed-form signals (measured: 26% off the n=30 zipper scan wall for a
    rank-4 sin_decay state vs the 8-bucket)."""
    r = int(jnp.max(ranks))
    if r <= 4:
        return min(chi, 4)
    return min(chi, max(8, ((r + 7) // 8) * 8))


def tighten(state):
    """Repad a container to the tight chi bucket for its realized ranks
    (host fetch of the int32 rank vector; orchestration-level only)."""
    from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO, mpo_repad
    from qilaplace_tpu.core.mps import repad

    chain = state.chain if hasattr(state, "chain") else state
    chi = _tight_bucket(chain.ranks, chain.chi)
    if chi == chain.chi:
        return state
    if isinstance(state, (MPO, PairedSiteMPO)):
        return mpo_repad(state, chi)
    return repad(state, chi)


def coarse_to_fine_pole_search(
    psi_z: ZTMPS,
    *,
    wr_coarse: float = float(TWO_PI),
    wr_fine: float = 0.5,
    wi: float = float(TWO_PI),
    coarse_points: int = 256,
    fine_points: int = 128,
    superfine_half: int = 24,
    cutoff: float = 1e-12,
    maxdim: int = 128,
    apply_fused: bool = True,
    readout: str = "auto",
    engine: str = "analytic",
    cache: bool = True,
    cache_dir: str | None = None,
) -> PoleSearchResult:
    """Automated coarse -> fine -> superfine pole identification
    (the flagship workflow, reference docs/src/tutorials/zt.jl:296-411).

    coarse:    stride N/coarse_points over the full (k, l) grid at wr_coarse;
    fine:      rebuild the zT MPO at wr_fine (denser radial sampling near
               |z| = 1), scan a window around the coarse peak;
    superfine: stride-1 window of half-width ``superfine_half`` around the
               fine peak, reusing the fine transform.

    ``engine="analytic"`` (default) builds each transform by the
    production rail-cross route; ``"gate"`` keeps the reference-parity
    layer fold. ``cache=True`` loads/saves per-wr operator artifacts
    (utils/io.cached_zt_mpo) so repeat searches skip the builds entirely.

    ``readout="direct"`` zipper-contracts <config| W |psi> per grid point
    without the intermediate truncated product — roundoff stays relative
    to the path product, which is what keeps f32 production scans at
    reference-grade accuracy (see :func:`chi_grid_direct`);
    ``readout="apply"`` forms the product state once per transform and
    batch-reads it (~50x fewer flops per point, but its floor sits at
    eps * ||W psi|| / peak — invisible in f64, ~1e-2 rel-peak in f32).
    ``readout="auto"`` (default) picks "direct" for 32-bit states
    (production) and "apply" for 64-bit states (parity studies), matching
    each dtype's accuracy/cost frontier.
    """
    n = psi_z.n
    N = 2**n
    wide = jnp.dtype(psi_z.chain.cores.dtype).itemsize >= 8
    dtype = jnp.complex128 if wide else jnp.complex64
    if readout == "auto":
        readout = "apply" if wide else "direct"
    psi_tight = tighten(psi_z) if readout == "direct" else psi_z

    def transform(wr):
        W = zt_mpo(n, wr, engine=engine, cutoff=cutoff, maxdim=maxdim,
                   dtype=dtype, cache=cache, cache_dir=cache_dir)
        if readout == "direct":
            return tighten(W)
        if apply_fused:
            return apply(W, psi_z, maxdim=maxdim, cutoff=cutoff)
        return apply(W, psi_z)

    def scan_one(state, ks, ls, wr):
        if readout == "direct":
            chi = chi_grid_direct(state, psi_tight, ks, ls)
            mag = jnp.abs(chi)
            flat = jnp.argmax(mag)
            i, j = jnp.unravel_index(flat, mag.shape)
            return ScanResult(
                ks=ks, ls=ls, chi=chi, k_peak=ks[i], l_peak=ls[j],
                z_peak=z_from_kl(ks[i], ls[j], n, wr, wi),
                wr=float(wr), wi=float(wi),
            )
        return pole_scan(state, ks, ls, wr=wr, wi=wi)

    # --- coarse ---
    stride_c = max(1, N // coarse_points)
    psi_c = transform(wr_coarse)
    ks_c = jnp.arange(0, N, stride_c)
    coarse = scan_one(psi_c, ks_c, ks_c, wr_coarse)

    # --- fine: re-center the coarse peak in the wr_fine coordinates ---
    psi_f = transform(wr_fine)
    k_c, l_c = kl_from_z(coarse.z_peak, n, wr_fine, wi)
    half_k = max(1, int(round(stride_c * wr_coarse / wr_fine)))
    half_l = max(1, stride_c)
    stride_fk = max(1, (2 * half_k) // fine_points)
    stride_fl = max(1, (2 * half_l) // fine_points)
    ks_f = jnp.clip(
        k_c + jnp.arange(-half_k, half_k + 1, stride_fk), 0, N - 1
    )
    ls_f = jnp.mod(l_c + jnp.arange(-half_l, half_l + 1, stride_fl), N)
    fine = scan_one(psi_f, ks_f, ls_f, wr_fine)

    # --- superfine: stride-1 zoom around the fine peak ---
    h = superfine_half
    ks_s = jnp.clip(fine.k_peak + jnp.arange(-h, h + 1), 0, N - 1)
    ls_s = jnp.mod(fine.l_peak + jnp.arange(-h, h + 1), N)
    superfine = scan_one(psi_f, ks_s, ls_s, wr_fine)

    return PoleSearchResult(coarse=coarse, fine=fine, superfine=superfine)
