"""Pallas TPU kernels for the hot readout path.

``coefficient_batch_pallas`` fuses the pole-scan readout chain — for every
configuration row, n bit-selected chi x chi matvecs — into fixed-shape
kernels: the running vectors stay in VMEM across all sites of a chunk (the
jnp/lax.scan version round-trips the [B, chi] intermediate through HBM at
every site), and the per-site work is 8 real [TILE_B, chi] @ [chi, chi] MXU
matmuls (complex arithmetic in split real/imag form; the TPU backend has no
complex Pallas support).

Chains are processed in SITE_CHUNK-site chunks with the [B, chi] running
vector carried between kernel calls: a chunk's core stack is
SITE_CHUNK * chi^2 * 2 * 4 bytes (8.4 MB at chi=128) and fits VMEM, where
the round-1 whole-chain kernel (31 MB at n=30) over-subscribed it and took
~390 s to compile. Chains are padded to a chunk multiple with identity
cores, so ONE Mosaic compile per (chi, TILE_B) serves every n — the
persistent compile cache then makes cold processes cheap too.

Dots run at HIGHEST precision (f32 multi-pass on the MXU); with default
bf16 precision the accumulated error over a 60-site chain is ~1e-2
relative — acceptable for |chi| peak scans but not for coefficients.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qilaplace_tpu.core.mps import ZTMPS

TILE_B = 256
SITE_CHUNK = 32
# VMEM budget for a chunk's core stack (split re/im f32). chi=128 keeps the
# historical 32-site chunks; wider effective chains (zipper_chain kron
# readout, chi_eff = chi_W * chi_psi up to 512) shrink the chunk instead of
# over-subscribing VMEM (the round-1 whole-chain kernel took ~390 s to
# compile for exactly that reason).
_CHUNK_VMEM_BYTES = 8 * 2**20


def _site_chunk(chi: int) -> int:
    per_site = chi * 2 * chi * 4 * 2
    return max(1, min(SITE_CHUNK, _CHUNK_VMEM_BYTES // per_site))


def _dot(a, b):
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(bits_ref, cr_ref, ci_ref, vr_in, vi_in, outr_ref, outi_ref):
    n = cr_ref.shape[0]

    bits_all = bits_ref[:]  # [tile, n] loaded once
    lane = jax.lax.broadcasted_iota(jnp.int32, bits_all.shape, 1)

    def body(site, carry):
        vr, vi = carry
        a0r = cr_ref[site, :, 0, :]
        a0i = ci_ref[site, :, 0, :]
        a1r = cr_ref[site, :, 1, :]
        a1i = ci_ref[site, :, 1, :]
        y0r = _dot(vr, a0r) - _dot(vi, a0i)
        y0i = _dot(vr, a0i) + _dot(vi, a0r)
        y1r = _dot(vr, a1r) - _dot(vi, a1i)
        y1i = _dot(vr, a1i) + _dot(vi, a1r)
        # Extract this site's bit per row with a one-hot lane reduction:
        # Mosaic supports neither 1-D reshapes, bool transposes, nor
        # dynamic lane slices.
        bcol = jnp.sum(
            jnp.where(lane == site, bits_all, 0), axis=1, keepdims=True
        )  # [tile, 1]
        sel = bcol == 0
        return jnp.where(sel, y0r, y1r), jnp.where(sel, y0i, y1i)

    vr, vi = jax.lax.fori_loop(0, n, body, (vr_in[:], vi_in[:]))
    outr_ref[:] = vr
    outi_ref[:] = vi


@partial(jax.jit, static_argnames=("interpret",))
def coefficient_batch_pallas(psi, configs, *, interpret: bool = False):
    """Pallas-fused batched coefficient readout.

    psi: MPS or ZTMPS; configs: [B, n] int. Returns [B] complex amplitudes.
    Chains longer than SITE_CHUNK are processed in chunks with the running
    vector carried through; the final chunk is identity-padded, so every
    (chi, TILE_B) pair compiles exactly one Mosaic kernel.
    """
    m = psi.chain if isinstance(psi, ZTMPS) else psi
    n, chi = m.n, m.chi
    site_chunk = _site_chunk(chi)
    configs = jnp.asarray(configs, jnp.int32)
    B = configs.shape[0]
    pad_b = (-B) % TILE_B
    pad_n = (-n) % site_chunk
    bits = jnp.pad(configs, ((0, pad_b), (0, pad_n)))  # [B_pad, n_pad]
    B_pad = B + pad_b
    n_pad = n + pad_n

    cr = jnp.real(m.cores).astype(jnp.float32)
    ci = jnp.imag(m.cores).astype(jnp.float32)
    if pad_n:
        eye = jnp.broadcast_to(
            jnp.eye(chi, dtype=jnp.float32)[None, :, None, :],
            (pad_n, chi, 2, chi),
        )
        cr = jnp.concatenate([cr, eye], axis=0)
        ci = jnp.pad(ci, ((0, pad_n), (0, 0), (0, 0), (0, 0)))

    grid = (B_pad // TILE_B,)
    vec_spec = pl.BlockSpec((TILE_B, chi), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    col = jnp.arange(chi)
    vr = jnp.broadcast_to(
        jnp.where(col == 0, 1.0, 0.0).astype(jnp.float32), (B_pad, chi)
    )
    vi = jnp.zeros((B_pad, chi), jnp.float32)

    for c in range(n_pad // site_chunk):
        sl = slice(c * site_chunk, (c + 1) * site_chunk)
        vr, vi = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_B, site_chunk), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((site_chunk, chi, 2, chi),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((site_chunk, chi, 2, chi),
                             lambda i: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                vec_spec,
                vec_spec,
            ],
            out_specs=(vec_spec, vec_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B_pad, chi), jnp.float32),
                jax.ShapeDtypeStruct((B_pad, chi), jnp.float32),
            ),
            interpret=interpret,
        )(bits[:, sl], cr[sl], ci[sl], vr, vi)

    vals = (vr[:B, 0] + 1j * vi[:B, 0]).astype(jnp.complex64)
    return m.amplitude.astype(jnp.complex64) * vals
