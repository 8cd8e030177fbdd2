"""T-DEED end-to-end module: backbone + positional embedding + SGP U-Net + heads.

Mirrors TDEEDModel.Impl (ref: model/model.py:23-149) minus the input
augmentation, which lives in tdeed_tpu/train/augment.py as pure functions so
the module itself stays deterministic apart from dropout. Input here is the
already normalized/cropped/standardized float tensor (B, T, H, W, 3) NHWC.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from tdeed_tpu.models.heads import FC2Layers, FCLayers
from tdeed_tpu.models.regnet import RegNetY
from tdeed_tpu.models.sgp import EDSGPMixer


class TDEED(nn.Module):
    """Precise-event-spotting model.

    Returns dict with:
      'logits': (B, T, num_classes+1) — or concat of two heads when
                two_heads is set (ref: model/modules.py:378-387)
      'displ':  (B, T) when radi_displacement > 0 (ref: model/model.py:141-144)
    """

    num_classes: int  # foreground classes (background slot added here)
    clip_len: int
    feature_arch: str = "rny002_gsf"
    n_layers: int = 2
    sgp_ks: int = 7
    sgp_r: float = 4.0
    radi_displacement: int = 2
    two_heads: Optional[Sequence[int]] = None  # (C1+1, C2+1) incl. backgrounds
    checkpoint_backbone: bool = False
    fuse_entry: bool = False
    fuse_shift: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False):
        b, t, h, w, c = frames.shape
        assert t == self.clip_len, (t, self.clip_len)

        arch = self.feature_arch.rsplit("_", 1)[0]
        shift_mode = None
        if self.feature_arch.endswith("_gsm"):
            shift_mode = "gsm"
        elif self.feature_arch.endswith("_gsf"):
            shift_mode = "gsf"

        # Optionally rematerialize backbone activations on the backward pass
        # (jax.checkpoint): trades FLOPs for HBM on long clips.
        cls = nn.remat(RegNetY, static_argnums=(2,)) if self.checkpoint_backbone else RegNetY
        backbone = cls(
            arch=arch,
            shift_mode=shift_mode,
            clip_len=self.clip_len,
            fuse_entry=self.fuse_entry,
            fuse_shift=self.fuse_shift,
            dtype=self.dtype,
            name="features",
        )
        feat = backbone(frames.reshape(b * t, h, w, c).astype(self.dtype), train)
        d = feat.shape[-1]
        feat = feat.reshape(b, t, d)

        # Learned additive temporal positional embedding, N(0, 1/clip_len)
        # (ref: model/model.py:65,137).
        temp_enc = self.param(
            "temp_enc",
            lambda key, shape: (1.0 / self.clip_len)
            * jax.random.normal(key, shape, jnp.float32),
            (self.clip_len, d),
        )
        feat = feat + temp_enc.astype(feat.dtype)

        feat = EDSGPMixer(
            clip_len=self.clip_len,
            num_layers=self.n_layers,
            kernel_size=self.sgp_ks,
            k=self.sgp_r,
            dtype=self.dtype,
            name="temp_fine",
        )(feat)

        out = {}
        if self.radi_displacement > 0:
            out["displ"] = FCLayers(1, dtype=self.dtype, name="pred_displ")(
                feat, train
            )[..., 0].astype(jnp.float32)

        if self.two_heads is not None:
            logits = FC2Layers(tuple(self.two_heads), dtype=self.dtype, name="pred_fine")(
                feat, train
            )
        else:
            logits = FCLayers(self.num_classes + 1, dtype=self.dtype, name="pred_fine")(
                feat, train
            )
        out["logits"] = logits.astype(jnp.float32)
        return out


def build_model(cfg, two_heads=None) -> TDEED:
    """Construct a TDEED module from a TDEEDConfig."""
    return TDEED(
        num_classes=cfg.num_classes,
        clip_len=cfg.clip_len,
        feature_arch=cfg.feature_arch,
        n_layers=cfg.n_layers,
        sgp_ks=cfg.sgp_ks,
        sgp_r=cfg.sgp_r,
        radi_displacement=cfg.radi_displacement,
        two_heads=two_heads,
        checkpoint_backbone=cfg.checkpoint_backbone,
        fuse_entry=cfg.fuse_entry,
        fuse_shift=getattr(cfg, "fuse_shift", False),
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )
