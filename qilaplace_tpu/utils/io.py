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
    a = np.asarray(arr)
    if np.iscomplexobj(a):
        out[prefix + ".re"] = np.ascontiguousarray(a.real)
        out[prefix + ".im"] = np.ascontiguousarray(a.imag)
    else:
        out[prefix] = a


def _join(prefix: str, data, device=None):
    if prefix + ".re" in data:
        re = jax.device_put(data[prefix + ".re"], device)
        im = jax.device_put(data[prefix + ".im"], device)
        return re + 1j * im  # combined on device; no complex transfer
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
