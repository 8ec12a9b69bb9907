"""Serialization of tensor-train containers.

The reference has no model checkpointing (objects are cheap to rebuild,
SURVEY.md section 5); its only persisted artifacts are benchmark JLD2 files.
Here, padded MPS/MPO stacks + metadata are saved as ``.npz`` so that:

* expensive large-n encodes and MPO builds become cacheable artifacts;
* parity fixtures can be committed and replayed across backends
  (complex arrays are stored as split real/imag — the tunneled TPU backend
  cannot transfer complex buffers, so loads recombine on device).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from qilaplace_tpu.core.mps import MPS, ZTMPS
from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO

_KINDS = {"MPS": MPS, "ZTMPS": ZTMPS, "MPO": MPO, "PairedSiteMPO": PairedSiteMPO}


def _split(prefix: str, arr, out: dict):
    if isinstance(arr, jax.Array) and jnp.issubdtype(
        arr.dtype, jnp.complexfloating
    ):
        # split ON DEVICE and fetch the real halves only: fetching a complex
        # buffer is UNIMPLEMENTED on the tunneled TPU backend
        out[prefix + ".re"] = np.asarray(jnp.real(arr))
        out[prefix + ".im"] = np.asarray(jnp.imag(arr))
        return
    a = np.asarray(arr)
    if np.iscomplexobj(a):
        out[prefix + ".re"] = np.ascontiguousarray(a.real)
        out[prefix + ".im"] = np.ascontiguousarray(a.imag)
    else:
        out[prefix] = a


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


def _join(prefix: str, data, device=None):
    if prefix + ".re" in data:
        re = jax.device_put(data[prefix + ".re"], device)
        im = jax.device_put(data[prefix + ".im"], device)
        # combined INSIDE a jitted program: an eager `re + 1j*im` would ship
        # a complex constant to the device (UNIMPLEMENTED on the tunnel)
        return _combine(re, im)
    return jax.device_put(data[prefix], device)


def save(path: str, obj) -> None:
    """Save an MPS / ZTMPS / MPO / PairedSiteMPO to ``path`` (.npz)."""
    out: dict = {}
    if isinstance(obj, (ZTMPS, PairedSiteMPO)):
        kind = type(obj).__name__
        chain = obj.chain
    else:
        kind = type(obj).__name__
        chain = obj
    out["kind"] = np.asarray(kind)
    _split("cores", chain.cores, out)
    out["ranks"] = np.asarray(chain.ranks)
    if hasattr(chain, "amplitude"):
        _split("amplitude", chain.amplitude, out)
    np.savez_compressed(path, **out)


def cached_zt_mpo(
    n: int,
    wr: float,
    *,
    cutoff: float,
    maxdim: int,
    chi: int,
    dtype=np.complex64,
    chi_work: int | None = None,
    cache_dir: str | None = None,
    device=None,
):
    """``build_zt_mpo`` with a persistent .npz artifact cache.

    The zT operator depends only on ``(n, wr, cutoff, maxdim, chi, dtype,
    chi_work)`` — not on the signal — so repeated runs (pole-scan drivers
    rebuild per wr; benches rebuild per process) can load the committed
    artifact instead of re-folding ~3n gate layers. This is the analog of
    the reference benchmarks' resumable JLD2 artifacts
    (scripts/benchmark/common.jl:195-221) applied to the operator itself.
    Returns ``(W, cache_hit)``.
    """
    import os

    from qilaplace_tpu.transforms.zt import build_zt_mpo

    if cache_dir is None:
        cache_dir = os.environ.get(
            "QILAPLACE_MPO_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "qilaplace_mpo"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    name = (
        f"zt_n{n}_wr{float(wr):.12g}_c{float(cutoff):.6g}_m{int(maxdim)}"
        f"_chi{int(chi)}_{np.dtype(dtype).name}"
        f"_w{0 if chi_work is None else int(chi_work)}.npz"
    )
    path = os.path.join(cache_dir, name)
    if os.path.exists(path):
        return load(path, device=device), True
    W = build_zt_mpo(n, wr, cutoff=cutoff, maxdim=maxdim, chi=chi,
                     dtype=dtype, chi_work=chi_work)
    save(path, W)
    return W, False


def load(path: str, *, device=None):
    """Load a container saved by :func:`save`, placing arrays on ``device``
    (default backend device when None)."""
    data = dict(np.load(path, allow_pickle=False))
    kind = str(data["kind"])
    cores = _join("cores", data, device)
    ranks = jax.device_put(data["ranks"].astype(np.int32), device)
    if kind in ("MPS", "ZTMPS"):
        amplitude = _join("amplitude", data, device)
        chain = MPS(cores=cores, ranks=ranks, amplitude=amplitude)
        return ZTMPS(chain=chain) if kind == "ZTMPS" else chain
    chain = MPO(cores=cores, ranks=ranks)
    return PairedSiteMPO(chain=chain) if kind == "PairedSiteMPO" else chain
