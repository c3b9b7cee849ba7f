"""Pallas TPU kernels for the hot point ops.

Each kernel has a pure-JAX reference in `pdm_ssd_tpu.ops` and an on-chip
parity check in `tools/tpu_kernel_check.py`. Dispatch helpers in
`pdm_ssd_tpu.ops.dispatch` pick the kernel on TPU backends and the reference
elsewhere.

- `fps.farthest_point_sample_pallas`: the max-min iteration in one kernel,
  distance cache VMEM-resident (exact index parity with the reference).
- `retired/` — kernels superseded on the production path but kept exact and
  importable (they still back the non-fused dispatch path and carry measured
  negative-result history):
  - `retired.onehot_gather.gather_rows` / `scatter_add_rows`: gathers/scatters
    as fused one-hot matmuls on the MXU with hi/lo split precision (exact;
    superseded by plain XLA row gathers after the ~6 ns/row calibration).
  - `retired.grid_query.grid_ball_query_pallas` /`grid_query_group_pallas`:
    bucketed ball query (+fused grouping) via indexed DMA of packed 128-lane
    cell rows (exact; superseded by `ops/sa_fused.py` on the production path).
"""
