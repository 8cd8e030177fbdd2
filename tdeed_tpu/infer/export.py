"""Serialized serving artifacts: the predict program exported to StableHLO.

The reference serves predictions only in-process, through its python
evaluation loop (ref: util/eval.py:290-349); deploying it elsewhere means
shipping torch + the full source tree. The TPU-idiomatic deployment unit is
instead the compiled program itself: ``jax.export`` serializes the jitted
predict step — weights folded in as constants — to a versioned StableHLO
blob that any JAX process (or a C++ PJRT host via the XLA runtime) can
deserialize and call without this package or its checkpoint format.

An export is a directory:

    predict.stablehlo         hflip=False pass
    predict_hflip.stablehlo   hflip=True pass (TTA; same input spec)
    manifest.json             shapes, classes, windowing protocol fields

Both passes take one input, ``frames`` (batch, clip_len, H, W, 3) uint8, and
return ``(argmax, probs)`` exactly like ``make_predict_step``'s callable —
preprocessing (scale, center-crop, standardize, flip) is inside the program.
The manifest carries everything the surrounding host loop needs to rebuild
the sliding-window protocol (stride, overlap, pad, NMS windows, class map).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from tdeed_tpu.config import TDEEDConfig
from tdeed_tpu.data.registry import DEFAULT_PAD_LEN, get_spec
from tdeed_tpu.infer.evaluate import INFERENCE_BATCH_SIZE

_PREDICT = "predict.stablehlo"
_PREDICT_HFLIP = "predict_hflip.stablehlo"
_MANIFEST = "manifest.json"


def export_predictor(
    cfg: TDEEDConfig,
    params,
    batch_stats,
    classes: Dict[str, int],
    out_dir: str,
    *,
    two_heads: Optional[Tuple[int, int]] = None,
    batch_size: int = INFERENCE_BATCH_SIZE,
    frame_hw: Optional[Tuple[int, int]] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> str:
    """Export the predict step (weights folded in) to ``out_dir``.

    frame_hw: spatial shape of the *stored* frames fed to the program
      (center-cropped to cfg.crop_dim inside); defaults to
      (crop_dim, crop_dim), i.e. frames already at model resolution.
    platforms: lowering targets burned into the artifact. The default covers
      the production TPU plus CPU (smoke tests / fallback hosts).

    Returns out_dir.
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.train.step import make_predict_step

    model = build_model(cfg, two_heads=two_heads)
    predict = make_predict_step(
        model,
        crop_dim=cfg.crop_dim,
        radi_displacement=cfg.radi_displacement,
        two_heads=two_heads,
    )
    # Close over the variables: they trace as constants, making the blob
    # self-contained (no checkpoint needed at the serving site).
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)

    hw = frame_hw or (cfg.crop_dim, cfg.crop_dim)
    spec_in = jax.ShapeDtypeStruct(
        (batch_size, cfg.clip_len, hw[0], hw[1], 3), jnp.uint8
    )

    os.makedirs(out_dir, exist_ok=True)
    for hflip, fname in ((False, _PREDICT), (True, _PREDICT_HFLIP)):

        def fn(frames, hflip=hflip):
            return predict(params, batch_stats, frames, hflip)

        exported = jexport.export(
            jax.jit(fn), platforms=list(platforms)
        )(spec_in)
        with open(os.path.join(out_dir, fname), "wb") as fp:
            fp.write(exported.serialize())

    spec = get_spec(cfg.dataset)
    manifest = {
        "model": cfg.model,
        "dataset": cfg.dataset,
        "batch_size": batch_size,
        "clip_len": cfg.clip_len,
        "crop_dim": cfg.crop_dim,
        "frame_hw": list(hw),
        "radi_displacement": cfg.radi_displacement,
        "two_heads": list(two_heads) if two_heads else None,
        "classes": classes,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        # sliding-window protocol (ref: train_tdeed.py:30-33, util/eval.py:25-31)
        "eval_stride": spec.eval_stride,
        "overlap_len": spec.eval_overlap_len(cfg.clip_len),
        "pad_len": DEFAULT_PAD_LEN,
        "hflip_tta": spec.hflip_tta,
        "nms_windows": list(spec.windows),
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as fp:
        json.dump(manifest, fp, indent=1)
    return out_dir


class ExportedPredictor:
    """Call a serialized export: ``probs = ep(frames, hflip=...)``.

    Thin host wrapper — deserializes both passes and jits their ``.call``.
    The artifact is the contract; this class only needs jax, not the model
    code (build_model/make_predict_step are never imported).
    """

    def __init__(self, export_dir: str):
        import jax
        from jax import export as jexport

        with open(os.path.join(export_dir, _MANIFEST)) as fp:
            self.manifest = json.load(fp)
        self._calls = {}
        for hflip, fname in ((False, _PREDICT), (True, _PREDICT_HFLIP)):
            with open(os.path.join(export_dir, fname), "rb") as fp:
                exported = jexport.deserialize(bytearray(fp.read()))
            self._calls[hflip] = jax.jit(exported.call)

    def __call__(self, frames, hflip: bool = False):
        """(batch, clip_len, H, W, 3) uint8 -> (argmax (B,T), probs (B,T,C+1))."""
        m = self.manifest
        want = (m["batch_size"], m["clip_len"], *m["frame_hw"], 3)
        if tuple(np.shape(frames)) != want:
            raise ValueError(
                f"exported program takes frames{list(want)} uint8, got "
                f"{list(np.shape(frames))} (pad ragged batches to batch_size)"
            )
        return self._calls[bool(hflip)](frames)
