"""Prediction heads (ref: model/modules.py:366-387)."""

from __future__ import annotations

from typing import Any, Sequence

from flax import linen as nn

from tdeed_tpu.models.common import TorchDense


class FCLayers(nn.Module):
    """Dropout(0.5) + Linear over the feature dim (ref: model/modules.py:366-376)."""

    num_classes: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        return TorchDense(self.num_classes, dtype=self.dtype, name="fc_out")(x)


class FC2Layers(nn.Module):
    """Two concatenated heads for joint two-dataset training
    (ref: model/modules.py:378-387, used via model/model.py:169-172)."""

    num_classes: Sequence[int]  # e.g. (13, 18) = SNB+1, SN+1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        import jax.numpy as jnp

        h1 = FCLayers(self.num_classes[0], dtype=self.dtype, name="fc1")(x, train)
        h2 = FCLayers(self.num_classes[1], dtype=self.dtype, name="fc2")(x, train)
        return jnp.concatenate([h1, h2], axis=-1)
