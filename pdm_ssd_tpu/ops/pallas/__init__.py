"""Pallas TPU kernels for the hot point ops.

Each kernel has a pure-JAX reference in `pdm_ssd_tpu.ops` and a parity test in
`tests/`. Dispatch helpers in `pdm_ssd_tpu.ops.dispatch` pick the kernel on
TPU backends and the reference elsewhere.
"""
