"""Pallas TPU kernels for the hot memory-bound ops.

Each kernel has a reference XLA path in the corresponding module under
``tdeed_tpu/models`` / ``tdeed_tpu/ops``; both are kept (SURVEY.md §7 build
plan step 7) and selected via the ``use_pallas`` flags. Kernels are
developed and unit-tested in interpreter mode on CPU, benchmarked on TPU.
"""
