"""tdeed_tpu — a TPU-native precise-event-spotting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of T-DEED
(arturxe2/T-DEED, CVsports @ CVPR 2024): frame pipelines, a RegNet-Y
backbone with gated temporal shift (GSM/GSF), the SGP-Mixer temporal
encoder-decoder, per-frame classification + displacement heads,
sliding-window inference with on-device aggregation, and tolerance-mAP /
SoccerNet scoring — designed TPU-first (bf16 on the MXU, NHWC layouts,
data-parallel over an ICI mesh via jax.sharding, static shapes under jit).

This is not a port: module boundaries, layouts and the execution model are
re-designed for XLA's compilation model. Reference files are cited in
docstrings as ``ref: <file>:<line>`` for behavioural parity checks.
"""

__version__ = "0.1.0"

from tdeed_tpu.config import TDEEDConfig, load_config  # noqa: F401
