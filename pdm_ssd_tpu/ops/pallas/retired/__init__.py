"""Retired Pallas kernels: exact, tested, but off the production hot path.

These kernels were the round-1/round-2 production path and lost measured
head-to-head comparisons against their successors (see BENCH_NOTES negative
results). They are kept because (a) the non-fused dispatch path
(`ops/dispatch.py`) still routes through them for the exact PointNet2 variant,
and (b) they document real measured TPU design history. Do not extend them;
new work goes through `ops/sa_fused.py` and plain XLA gathers.
"""
