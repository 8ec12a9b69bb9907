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

import functools

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


def save(path: str, obj, *, compress: bool = True) -> None:
    """Save an MPS / ZTMPS / MPO / PairedSiteMPO to ``path`` (.npz).

    ``compress=False`` writes a plain .npz (no deflate) — the right choice
    for warm-path artifact caches, where load latency is the budget."""
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
    (np.savez_compressed if compress else np.savez)(path, **out)


def default_cache_dir() -> str:
    """MPO artifact cache directory (env ``QILAPLACE_MPO_CACHE`` overrides;
    the analog of the reference benchmarks' resumable JLD2 artifact store,
    scripts/benchmark/common.jl:195-221, applied to the operator itself)."""
    import os

    return os.environ.get(
        "QILAPLACE_MPO_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "qilaplace_mpo"),
    )


def cached_mpo(name: str, build_fn, *, cache_dir: str | None = None,
               device=None):
    """Generic persistent .npz MPO artifact cache: load ``<cache_dir>/
    <name>.npz`` if present, else run ``build_fn()``, persist, return.
    Returns ``(W, cache_hit)``. Artifacts are atomic (tmp + rename) so
    concurrent builders never observe a torn file."""
    import os
    import tempfile

    if cache_dir is None:
        cache_dir = default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, name + ".npz")
    if os.path.exists(path):
        return load(path, device=device), True
    W = build_fn()
    fd, tmp = tempfile.mkstemp(suffix=".npz", dir=cache_dir)
    os.close(fd)
    try:
        save(tmp, W, compress=False)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return W, False


def cached_zt_mpo(
    n: int,
    wr: float,
    *,
    cutoff: float,
    maxdim: int,
    chi: int | None = None,
    dtype=np.complex64,
    chi_work: int | None = None,
    cache_dir: str | None = None,
    device=None,
    engine: str = "gate",
):
    """zT MPO builder with a persistent .npz artifact cache.

    The zT operator depends only on ``(engine, n, wr, cutoff, maxdim, chi,
    dtype, chi_work)`` — not on the signal — so repeated runs (pole-scan
    drivers rebuild per wr; benches rebuild per process) load the artifact
    instead of rebuilding. ``engine``: "gate" (reference-parity layer fold,
    transforms/zt.py) or "analytic" (production rail-cross builder,
    transforms/analytic.py). Returns ``(W, cache_hit)``.
    """
    name = (
        f"zt_{engine}_n{n}_wr{float(wr):.12g}_c{float(cutoff):.6g}"
        f"_m{int(maxdim)}_chi{0 if chi is None else int(chi)}"
        f"_{np.dtype(dtype).name}"
        f"_w{0 if chi_work is None else int(chi_work)}"
    )

    def build():
        if engine == "analytic":
            from qilaplace_tpu.transforms.analytic import analytic_zt_mpo

            return analytic_zt_mpo(n, wr, cutoff=cutoff, maxdim=maxdim,
                                   chi=chi, dtype=dtype)
        if engine == "gate":
            from qilaplace_tpu.transforms.zt import build_zt_mpo

            return build_zt_mpo(n, wr, cutoff=cutoff, maxdim=maxdim,
                                chi=chi, dtype=dtype, chi_work=chi_work)
        raise ValueError(
            f"cached_zt_mpo: unknown engine {engine!r}; "
            "use 'analytic' or 'gate'"
        )

    return cached_mpo(name, build, cache_dir=cache_dir, device=device)


def cached_zt_pack(
    n: int,
    wr: float,
    *,
    cutoff: float,
    maxdim: int,
    chi: int | None = None,
    seed: int = 7,
    cache_dir: str | None = None,
):
    """zT factor pack (transforms/analytic.zt_product_pack) behind the
    same persistent artifact cache as the assembled operators — the pack
    is the right artifact for thin host<->device links (~20x smaller).
    Returns ``(pack, cache_hit)``."""
    import os
    import tempfile

    from qilaplace_tpu.transforms.analytic import zt_product_pack

    if cache_dir is None:
        cache_dir = default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    name = (
        f"ztpack_n{n}_wr{float(wr):.12g}_c{float(cutoff):.6g}"
        f"_m{int(maxdim)}_chi{0 if chi is None else int(chi)}_s{int(seed)}"
    )
    path = os.path.join(cache_dir, name + ".npz")
    if os.path.exists(path):
        return dict(np.load(path, allow_pickle=False)), True
    pack = zt_product_pack(n, wr, cutoff=cutoff, maxdim=maxdim, chi=chi,
                           seed=seed)
    fd, tmp = tempfile.mkstemp(suffix=".npz", dir=cache_dir)
    os.close(fd)
    try:
        np.savez(tmp, **pack)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return pack, False


def ship(obj, device, *, dtype=jnp.complex64):
    """Place a container on ``device`` via SPLIT real/imag transfers.

    The tunneled TPU backend cannot transfer complex buffers (and complex
    transfer errors surface lazily, wedging the relay) — so complex cores
    are fetched to host as f32 halves, shipped separately, and recombined
    INSIDE a jitted program on the target device. Real cores ship directly.
    Works for MPS / ZTMPS / MPO / PairedSiteMPO; ranks/amplitude ship as
    int32/f32."""
    if isinstance(obj, (ZTMPS, PairedSiteMPO)):
        chain = obj.chain
    else:
        chain = obj
    cores = chain.cores
    tgt = jnp.dtype(dtype)
    half = (
        jnp.float64
        if tgt in (jnp.dtype(jnp.float64), jnp.dtype(jnp.complex128))
        else jnp.float32
    )
    if np.dtype(cores.dtype).kind == "c":
        # split ON THE HOST BACKEND: uncommitted complex arrays would
        # otherwise dispatch jnp.real/imag on the default device, and the
        # tunneled TPU cannot run (or fetch) complex programs
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            re = np.asarray(jnp.real(cores), half)
        if tgt.kind == "f":
            cores_d = jax.device_put(re.astype(tgt), device)
        else:
            with jax.default_device(cpu):
                im = np.asarray(jnp.imag(cores), half)
            combine = jax.jit(
                lambda a, b: jax.lax.complex(a, b).astype(dtype),
                device=device,
            )
            cores_d = combine(jax.device_put(re, device),
                              jax.device_put(im, device))
    else:
        host = np.asarray(cores)
        if tgt.kind == "c":
            upcast = jax.jit(lambda a: a.astype(dtype), device=device)
            cores_d = upcast(jax.device_put(host.astype(half), device))
        else:
            cores_d = jax.device_put(host.astype(tgt), device)
    ranks_d = jax.device_put(np.asarray(chain.ranks, np.int32), device)
    if hasattr(chain, "amplitude"):
        amp = jax.device_put(
            np.float32(np.real(np.asarray(chain.amplitude))), device
        )
        new_chain = MPS(cores=cores_d, ranks=ranks_d, amplitude=amp)
    else:
        new_chain = MPO(cores=cores_d, ranks=ranks_d)
    if isinstance(obj, ZTMPS):
        return ZTMPS(chain=new_chain)
    if isinstance(obj, PairedSiteMPO):
        return PairedSiteMPO(chain=new_chain)
    return new_chain


@functools.lru_cache(maxsize=32)
def _ship_assemble_jit(c_shape, s_complex, has_amp, state_dtype_name,
                       half_name, ranks_shape, meta, mpo_dtype_name,
                       flt_total, ints_len, device):
    """Memoized jitted state+pack assembler (same rationale as
    transforms.analytic._pack_assemble_jit: a per-call closure re-traces
    and re-compiles ~0.2 s every setup, never amortized by the persistent
    cache because it sits under the 1 s write threshold).

    The int index tables ride the SAME buffer as the floats, appended as
    bit-cast words and bitcast back in-program — ONE device_put + ONE
    program is the minimum number of tunnel round trips (~15 ms each)."""
    from qilaplace_tpu.transforms.analytic import pack_assemble

    state_dtype = jnp.dtype(state_dtype_name)
    half = jnp.dtype(half_name)
    mpo_dtype = jnp.dtype(mpo_dtype_name)
    cn = int(np.prod(c_shape))
    ranks_size = int(np.prod(ranks_shape))
    s_flt_len = cn * (2 if s_complex else 1) + (1 if has_amp else 0)

    def assemble(buf):
        flt = buf[:flt_total]
        # f32 words bitcast 1:1; f64 words bitcast to int32 pairs [k, 2]
        ints = jax.lax.bitcast_convert_type(
            buf[flt_total:], jnp.int32
        ).reshape(-1)[:ints_len]
        if s_complex:
            sc = jax.lax.complex(
                flt[:cn].reshape(c_shape),
                flt[cn : 2 * cn].reshape(c_shape),
            ).astype(state_dtype)
        else:
            sc = flt[:cn].reshape(c_shape).astype(state_dtype)
        a = flt[s_flt_len - 1].astype(half) if has_amp else None
        sr = ints[:ranks_size].reshape(ranks_shape)
        wc, wr = pack_assemble(flt[s_flt_len:], ints[ranks_size:], meta,
                               mpo_dtype)
        return sc, a, sr, wc, wr

    return jax.jit(assemble, device=device)


def ship_state_and_pack(obj, pack, device, *, state_dtype=jnp.float32,
                        mpo_dtype=jnp.complex64):
    """Ship a state AND a zT factor pack in ONE coalesced float transfer +
    ONE int32 transfer + ONE assembly program, returning
    ``(state_on_device, PairedSiteMPO_on_device)``.

    This is the thin-link setup path: per-dispatch latency on the tunneled
    TPU backend is ~15-30 ms, so the separate ``ship(psi)`` (3 puts) +
    ``zt_mpo_from_pack`` (2 puts + 1 program) pays ~6 round-trips for
    ~2 MB of bytes. Coalescing halves the setup dispatches. Complex/f64
    never crosses the tunnel: complex cores split into halves on the host
    backend and recombine inside the device program."""
    from qilaplace_tpu.transforms.analytic import pack_assemble, pack_flatten

    chain = obj.chain if isinstance(obj, (ZTMPS, PairedSiteMPO)) else obj
    s_tgt = jnp.dtype(state_dtype)
    half = (
        np.float64
        if s_tgt in (jnp.dtype(jnp.float64), jnp.dtype(jnp.complex128))
        else np.float32
    )
    m_half = (
        np.float64 if jnp.dtype(mpo_dtype) == jnp.dtype(jnp.complex128)
        else np.float32
    )
    if m_half != half:
        raise ValueError("ship_state_and_pack: state/mpo dtypes must share "
                         "a float width (both 32-bit or both 64-bit)")
    cores = chain.cores
    cpu = jax.local_devices(backend="cpu")[0]
    parts = []
    if np.dtype(cores.dtype).kind == "c":
        with jax.default_device(cpu):
            parts.append(np.asarray(jnp.real(cores), half).ravel())
            if s_tgt.kind == "c":
                parts.append(np.asarray(jnp.imag(cores), half).ravel())
    else:
        parts.append(np.asarray(cores, half).ravel())
    amp = np.asarray(
        [np.real(np.asarray(chain.amplitude))]
        if hasattr(chain, "amplitude") else [], half
    )
    parts.append(amp)
    p_flt, p_ints, meta = pack_flatten(pack, half)
    parts.append(p_flt)
    flt = np.concatenate(parts)
    s_ranks = np.asarray(chain.ranks, np.int32)
    ints = np.concatenate([s_ranks.ravel(), p_ints])
    # append the int tables to the float buffer as bit-cast words (int32
    # pairs for a 64-bit half), padded to a whole word count
    words_per = np.dtype(half).itemsize // 4
    ints_pad = np.pad(ints, (0, (-ints.size) % words_per))
    buf = np.concatenate([flt, ints_pad.view(half)])
    c_shape = tuple(cores.shape)
    s_complex = s_tgt.kind == "c" and np.dtype(cores.dtype).kind == "c"
    assemble = _ship_assemble_jit(
        c_shape, s_complex, amp.size > 0, jnp.dtype(state_dtype).name,
        np.dtype(half).name, tuple(s_ranks.shape), meta,
        jnp.dtype(mpo_dtype).name, int(flt.size), int(ints.size), device,
    )
    sc, a, sr, wc, w_ranks = assemble(jax.device_put(buf, device))
    if amp.size > 0:
        new_chain = MPS(cores=sc, ranks=sr, amplitude=a)
    else:
        new_chain = MPO(cores=sc, ranks=sr)
    if isinstance(obj, ZTMPS):
        state = ZTMPS(chain=new_chain)
    elif isinstance(obj, PairedSiteMPO):
        state = PairedSiteMPO(chain=new_chain)
    else:
        state = new_chain
    W = PairedSiteMPO(chain=MPO(cores=wc, ranks=w_ranks))
    return state, W


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
