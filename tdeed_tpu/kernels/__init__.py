"""TPU compute-path modules: measured graph-level formulations + Pallas.

``gated_shift`` hosts the GSF math with the factored gate GEMM (the
measured production formulation); ``augment`` hosts the fused photometric
Pallas kernel with its XLA reference chain beside it (selected via the
``pallas_augment`` config knob; interpret-mode tested on CPU, parity- and
perf-verified on TPU).
"""
