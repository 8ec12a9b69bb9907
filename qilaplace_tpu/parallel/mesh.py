"""Multi-chip parallelism over a jax.sharding.Mesh.

The reference is a single-process library with no parallelism of any kind
(SURVEY.md section 2.3); its scaling story is algorithmic. The TPU-native
scaling axes added here are the embarrassingly-parallel ones the workload
actually has:

* ``dp`` (data/batch): many signals encoded + transformed at once — one
  vmapped program sharded over chips;
* ``grid``: the (k, l) pole-scan grid of one transformed state — the MPS is
  replicated (tiny: n*chi*2*chi cores) and the readout batch is sharded.

No halo exchange or sequence-parallelism is needed: a single MPS chain at
n <= 30, chi <= 256 fits comfortably on one chip; collectives are limited to
the implicit all-gather of results and psum-reductions in the fitting step.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qilaplace_tpu.core.mps import MPS, coefficient_batch, norm
from qilaplace_tpu.core.mpo import MPO, PairedSiteMPO, mpo_repad
from qilaplace_tpu.ops.apply import apply, apply_coefficient_batch
from qilaplace_tpu.signals.encode import signal_mps


def make_mesh(n_devices: int | None = None, axis_names=("dp", "grid"), shape=None):
    """Build a device mesh. Default: all devices on ``dp`` with a trivial
    ``grid`` axis; pass ``shape`` to split, e.g. (4, 2)."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def shard_batch(mesh: Mesh, x, axis: str = "dp"):
    """Place a batched array with its leading axis sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. an MPO) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def batched_signal_mps(xs, *, chi: int, cutoff: float = 1e-12, method="svd", **kw):
    """vmapped encoder: [B, N] signals -> batched MPS pytree."""
    return jax.vmap(
        lambda v: signal_mps(v, cutoff=cutoff, chi=chi, method=method, **kw)
    )(xs)


def batched_qft_pipeline(W: MPO, xs, configs, *, chi: int, cutoff: float = 1e-12):
    """Encode a batch of signals, apply ``W`` (fused), read out ``configs``.

    xs: [B, N]; configs: [C, n]; returns [B, C] coefficients. Shard xs over
    ``dp`` and this runs dp-parallel with W replicated.
    """

    def one(x):
        psi = signal_mps(x, cutoff=cutoff, chi=chi)
        out = apply(W, psi, maxdim=chi, cutoff=cutoff)
        return coefficient_batch(out, configs)

    return jax.vmap(one)(xs)


def sharded_chi_grid(mesh: Mesh, psi, configs):
    """Pole-scan readout with the config batch sharded over every mesh axis.

    psi is replicated; configs [B, 2n] is sharded on its leading axis across
    the flattened mesh. Returns the [B] coefficient vector (implicitly
    all-gathered).
    """
    axes = tuple(mesh.axis_names)
    configs = jax.device_put(
        configs, NamedSharding(mesh, P(axes, None))
    )
    psi = replicate(mesh, psi)
    f = jax.jit(coefficient_batch)
    return f(psi, configs)


def stack_mpos(Ws, chi: int | None = None):
    """Stack same-length MPOs into one leading-axis-batched container
    (repadded to a common bucket first). The result is a valid vmap
    operand: every leaf carries the batch axis."""
    chains = [W.chain if isinstance(W, PairedSiteMPO) else W for W in Ws]
    if chi is None:
        chi = max(c.chi for c in chains)
    chains = [c if c.chi == chi else mpo_repad(c, chi) for c in chains]
    cores = jnp.stack([c.cores for c in chains])
    ranks = jnp.stack([c.ranks for c in chains])
    batched = MPO(cores=cores, ranks=ranks)
    if isinstance(Ws[0], PairedSiteMPO):
        return PairedSiteMPO(chain=batched)
    return batched


# vmapped direct readout: one program evaluates B grid points under EVERY
# stacked operator (multi-wr pole scans) — the GEMM batch grows by the
# operator count, which is what fills the MXU the single scan leaves idle
_multi_direct = jax.jit(
    jax.vmap(apply_coefficient_batch, in_axes=(0, None, None))
)


def multi_mpo_chi_batch(Ws_stacked, psi, configs) -> jax.Array:
    """Direct <config| W_i |psi> for a STACKED operator batch: returns
    [n_ops, B] coefficients. ``Ws_stacked`` comes from :func:`stack_mpos`;
    one device program for all operators (multi-wr scans — the round-3
    verdict's "put the idle chip to work" lever)."""
    return _multi_direct(Ws_stacked, psi, configs)


def sharded_multi_scan(mesh: Mesh, Ws_stacked, psi, configs) -> jax.Array:
    """Multi-operator direct scan sharded over the mesh: the operator
    batch rides ``dp``, the config batch rides ``grid``, psi is
    replicated. ``n_ops`` must divide by the dp axis size and the config
    count by the grid axis size (shard-shape requirement). Returns
    [n_ops, B]."""
    chain = (
        Ws_stacked.chain
        if isinstance(Ws_stacked, PairedSiteMPO)
        else Ws_stacked
    )
    nd = {"cores": 6, "ranks": 2}
    sharded_chain = MPO(
        cores=jax.device_put(
            chain.cores,
            NamedSharding(mesh, P("dp", *([None] * (nd["cores"] - 1)))),
        ),
        ranks=jax.device_put(
            chain.ranks, NamedSharding(mesh, P("dp", None))
        ),
    )
    if isinstance(Ws_stacked, PairedSiteMPO):
        Ws_stacked = PairedSiteMPO(chain=sharded_chain)
    else:
        Ws_stacked = sharded_chain
    configs = jax.device_put(configs, NamedSharding(mesh, P("grid", None)))
    psi = replicate(mesh, psi)
    return _multi_direct(Ws_stacked, psi, configs)


@partial(jax.jit, static_argnames=("lr",))
def fit_mpo_step(W: MPO, psis: MPS, configs, targets, lr: float = 0.1):
    """One SGD step fitting an MPO so that applying it to a batch of states
    reproduces target coefficients — the "training step" of this framework.

    psis: batched MPS (leading axis dp-shardable), configs [C, n],
    targets [B, C]. The loss mean over the batch makes the parameter gradient
    a cross-device psum when the batch is sharded. Returns (W', loss).
    """

    def loss_fn(cores):
        W2 = MPO(cores=cores, ranks=W.ranks)

        def one(psi, tgt):
            # exact (truncation-free) apply: pure contractions, cleanly
            # differentiable (the fused path's SVD is not, at degeneracies)
            out = apply(W2, psi)
            got = coefficient_batch(out, configs)
            return jnp.sum(jnp.abs(got - tgt) ** 2)

        return jnp.mean(jax.vmap(one)(psis, targets))

    loss, grad = jax.value_and_grad(loss_fn)(W.cores)
    new_cores = W.cores - lr * jnp.conj(grad)
    return MPO(cores=new_cores, ranks=W.ranks), loss
