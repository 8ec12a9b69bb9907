"""Pallas TPU kernels for the hot readout path.

``coefficient_batch_pallas`` fuses the whole pole-scan readout chain — for
every configuration row, n bit-selected chi x chi matvecs — into one kernel:
the running vectors stay in VMEM across all sites (the jnp/lax.scan version
round-trips the [B, chi] intermediate through HBM at every site), and the
per-site work is 8 real [TILE_B, chi] @ [chi, chi] MXU matmuls (complex
arithmetic in split real/imag form; the TPU backend has no complex Pallas
support).

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


def _dot(a, b):
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _kernel(bits_ref, cr_ref, ci_ref, outr_ref, outi_ref):
    n, chi = cr_ref.shape[0], cr_ref.shape[1]
    tile = outr_ref.shape[0]

    # boundary vector e0 per row (scatter/.at[].set does not lower in Pallas)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, chi), 1)
    vr0 = jnp.where(col == 0, 1.0, 0.0).astype(jnp.float32)
    vi0 = jnp.zeros((tile, chi), jnp.float32)

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

    vr, vi = jax.lax.fori_loop(0, n, body, (vr0, vi0))
    outr_ref[:] = vr
    outi_ref[:] = vi


@partial(jax.jit, static_argnames=("interpret",))
def coefficient_batch_pallas(psi, configs, *, interpret: bool = False):
    """Pallas-fused batched coefficient readout.

    psi: MPS or ZTMPS; configs: [B, n] int. Returns [B] complex amplitudes.
    Requires n * chi^2 * 8 bytes of VMEM for the core stack (n <= 60 at
    chi = 128 fits); fall back to core.mps.coefficient_batch beyond that.
    """
    m = psi.chain if isinstance(psi, ZTMPS) else psi
    n, chi = m.n, m.chi
    configs = jnp.asarray(configs, jnp.int32)
    B = configs.shape[0]
    pad = (-B) % TILE_B
    bits = jnp.pad(configs, ((0, pad), (0, 0)))  # [B_pad, n]
    B_pad = B + pad

    cr = jnp.real(m.cores).astype(jnp.float32)
    ci = jnp.imag(m.cores).astype(jnp.float32)

    grid = (B_pad // TILE_B,)
    outr, outi = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_B, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, chi, 2, chi), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, chi, 2, chi), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_B, chi), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, chi), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B_pad, chi), jnp.float32),
            jax.ShapeDtypeStruct((B_pad, chi), jnp.float32),
        ),
        interpret=interpret,
    )(bits, cr, ci)

    vals = (outr[:B, 0] + 1j * outi[:B, 0]).astype(jnp.complex64)
    return m.amplitude.astype(jnp.complex64) * vals
