"""qilaplace_tpu — TPU-native quantum-inspired Fourier/Laplace transforms.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SUTD-MDQS/QILaplace.jl (reference facade: src/QILaplace.jl:21-82): encode a
length-2^n signal as a quantics MPS, build compressed MPOs for the QFT
(discrete Fourier), DT (damping transform) and zT (discrete Laplace /
z-transform), apply them by MPO-MPS contraction, and read out individual
transformed coefficients without materializing dense vectors.

Architecture (TPU-first, not a port):
  * static-shape padded tensor trains (cores ``[n, chi, 2, chi]`` + rank
    vector) instead of ITensors' dynamic Index objects — every sweep
    jit-compiles to a single XLA program;
  * masked truncated SVD instead of shape-changing truncation;
  * the paired register (ZTMPS) is stored natively as its interleaved
    2n-site chain (the reference funnels every op through that form anyway,
    reference src/mps.jl:421-472);
  * coefficient readout is a vmapped ``lax.scan`` chain — pole scans run as
    one device program instead of 1e4-1e5 serial contractions;
  * batch/grid parallelism via ``jax.sharding`` meshes.
"""

from qilaplace_tpu.core.mps import (
    MPS,
    SignalMPS,
    ZTMPS,
    nsite,
    validate,
    coefficient,
    coefficient_batch,
    mps_to_vector,
    norm,
    canonicalize,
    compress,
    siteindices,
    bondindices,
)
from qilaplace_tpu.core.mpo import (
    MPO,
    SingleSiteMPO,
    PairedSiteMPO,
    identity_mpo,
    mpo_to_dense,
)
from qilaplace_tpu.ops.apply import apply, apply_coefficient_batch, apply_mpo_mpo
from qilaplace_tpu.ops.rsvd import rsvd
from qilaplace_tpu.signals.generate import generate_signal
from qilaplace_tpu.signals.encode import signal_mps, signal_ztmps
from qilaplace_tpu.transforms.qft import build_qft_mpo
from qilaplace_tpu.transforms.dt import build_dt_mpo
from qilaplace_tpu.transforms.zt import build_zt_mpo, zt_mpo
from qilaplace_tpu.transforms.analytic import (
    analytic_dt_mpo,
    analytic_qft_mpo,
    analytic_zt_mpo,
)
from qilaplace_tpu.scan.pole_scan import (
    chi_grid,
    chi_grid_direct,
    z_from_kl,
    kl_from_z,
    pole_scan,
    coarse_to_fine_pole_search,
    tighten,
)

__version__ = "0.1.0"

__all__ = [
    "MPS",
    "SignalMPS",
    "ZTMPS",
    "nsite",
    "validate",
    "coefficient",
    "coefficient_batch",
    "mps_to_vector",
    "norm",
    "canonicalize",
    "compress",
    "siteindices",
    "bondindices",
    "MPO",
    "SingleSiteMPO",
    "PairedSiteMPO",
    "identity_mpo",
    "mpo_to_dense",
    "apply",
    "apply_coefficient_batch",
    "apply_mpo_mpo",
    "rsvd",
    "generate_signal",
    "signal_mps",
    "signal_ztmps",
    "build_qft_mpo",
    "build_dt_mpo",
    "build_zt_mpo",
    "zt_mpo",
    "analytic_qft_mpo",
    "analytic_dt_mpo",
    "analytic_zt_mpo",
    "chi_grid",
    "chi_grid_direct",
    "z_from_kl",
    "kl_from_z",
    "pole_scan",
    "coarse_to_fine_pole_search",
    "tighten",
]
