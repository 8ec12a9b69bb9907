from qilaplace_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batched_signal_mps,
    batched_qft_pipeline,
    sharded_chi_grid,
    stack_mpos,
    multi_mpo_chi_batch,
    sharded_multi_scan,
    fit_mpo_step,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "batched_signal_mps",
    "batched_qft_pipeline",
    "sharded_chi_grid",
    "stack_mpos",
    "multi_mpo_chi_batch",
    "sharded_multi_scan",
    "fit_mpo_step",
]
