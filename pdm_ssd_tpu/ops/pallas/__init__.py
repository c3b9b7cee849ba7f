"""Pallas TPU kernels for the hot point ops.

Each kernel has a pure-JAX reference in `pdm_ssd_tpu.ops` and an on-chip
parity check in `tools/tpu_kernel_check.py`. Dispatch helpers in
`pdm_ssd_tpu.ops.dispatch` pick the kernel on TPU backends and the reference
elsewhere.

- `fps.farthest_point_sample_pallas`: the max-min iteration in one kernel,
  distance cache VMEM-resident (exact index parity with the reference).
- `onehot_gather.gather_rows` / `scatter_add_rows`: gathers/scatters as fused
  one-hot matmuls on the MXU with hi/lo split precision (exact).
- `grid_query.grid_ball_query_pallas`: bucketed ball query via indexed DMA of
  packed 128-lane cell rows (the production neighbor search).
- `grid_query.grid_query_group_pallas`: fused query + feature grouping
  (exact; perf optimization is the top round-2 kernel item).
"""
