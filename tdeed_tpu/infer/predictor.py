"""Persistent inference engine: load once, spot events in many videos.

Serving-oriented surface with no reference counterpart (the reference only
evaluates datasets through ``evaluate()``, ref: util/eval.py:264-419). A
``SpottingPredictor`` holds the jitted predict step, the compile cache, and
the checkpoint; ``spot()`` runs sliding-window inference over one video's
frame directory and returns NMS'd events — so a long-lived process (batch
job, RPC wrapper, notebook) pays the compile exactly once.

The device path is the same static-shape predict program as evaluation:
windows are padded to the fixed (batch, clip_len) shape, so every request
reuses one XLA executable per hflip value.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from tdeed_tpu.config import TDEEDConfig, load_config
from tdeed_tpu.data.frames import get_decoder, load_window
from tdeed_tpu.data.registry import (
    DEFAULT_PAD_LEN,
    FPS_SN,
    get_spec,
    load_classes,
)
from tdeed_tpu.infer.evaluate import INFERENCE_BATCH_SIZE
from tdeed_tpu.infer.nms import (
    non_maximum_suppression,
    soft_non_maximum_suppression,
)


class SpottingPredictor:
    """Event spotting over frame directories with a persistent jitted model.

    Args:
      cfg: TDEEDConfig (or use ``from_run`` to load config + best ckpt).
      params/batch_stats: model variables (e.g. from a restored checkpoint).
      classes: {name: id} with ids 1..N (0 = background).
    """

    def __init__(self, cfg: TDEEDConfig, params, batch_stats,
                 classes: Dict[str, int], two_heads=None,
                 batch_size: int = INFERENCE_BATCH_SIZE,
                 n_devices: Optional[int] = None):
        import jax

        from tdeed_tpu.models.tdeed import build_model
        from tdeed_tpu.train.step import make_predict_step
        from tdeed_tpu.utils.profiling import enable_compilation_cache

        enable_compilation_cache()
        self.cfg = cfg
        self.spec = get_spec(cfg.dataset)
        self.classes = classes
        self.classes_inv = {v: k for k, v in classes.items()}
        # n_devices > 1: serve batch-parallel over a local DP mesh — window
        # batches shard across devices (the heavy forward), weights and
        # score buffers replicate; per-window results are identical to the
        # single-device program. Batch size rounds up to a mesh multiple.
        self._mesh = None
        if n_devices is not None and n_devices > 1:
            from tdeed_tpu.parallel.mesh import make_mesh

            self._mesh = make_mesh(n_devices)
            batch_size = -(-batch_size // n_devices) * n_devices
        self.batch_size = batch_size
        self.decoder = get_decoder(cfg.decoder)
        # Decoded-frame LRU: serving windows overlap ~75%
        # (spec.eval_overlap_len), so the cache serves most repeat decodes
        # from memory (cfg.decode_cache_mb, 0 = off).
        self._cache = None
        if getattr(cfg, "decode_cache_mb", 0) > 0:
            from tdeed_tpu.data.loader import FrameCache

            self._cache = FrameCache(cfg.decode_cache_mb << 20)
        # Checkpoint restores land as host numpy trees; upload once so the
        # per-window predict calls don't re-transfer the weights.
        if self._mesh is not None:
            from tdeed_tpu.parallel.mesh import replicated

            rep = replicated(self._mesh)
            params = jax.device_put(params, rep)
            batch_stats = jax.device_put(batch_stats, rep)
            self._params = params
            self._batch_stats = batch_stats
        else:
            self._params = jax.device_put(params)
            self._batch_stats = jax.device_put(batch_stats)
        model = build_model(cfg, two_heads=two_heads)
        self._predict_raw = make_predict_step(
            model, crop_dim=cfg.crop_dim,
            radi_displacement=cfg.radi_displacement, two_heads=two_heads,
        )
        self._predict = jax.jit(self._predict_raw, static_argnums=(3,))
        self._acc_step = jax.jit(self._make_acc_step(), static_argnums=(7, 8))

    def _make_acc_step(self):
        """One fused device program: predict a window batch and scatter-add
        it into per-video score/support buffers living on the device.

        The host-accumulate path (predict_windows) synchronizes on every
        batch (np.asarray is a D2H fence), capping dispatch pipelining; this
        keeps the whole video's aggregation on device and transfers once at
        the end. Buffers carry clip_len slack at both ends so the
        reference's bound clamping (ref: util/eval.py:303-317) becomes plain
        in-bounds dynamic slices: windows start at >= -pad_len and overrun
        the tail by < clip_len, both inside the slack.
        """
        import jax
        import jax.numpy as jnp

        clip_len = self.cfg.clip_len
        predict = self._predict_raw

        def acc_step(params, stats, frames, starts, valid, scores_buf,
                     support_buf, hflip, tta):
            _, probs = predict(params, stats, frames, hflip)
            probs = probs.astype(jnp.float32) * valid[:, None, None]
            n_cls = probs.shape[-1]
            for i in range(frames.shape[0]):  # static batch unroll
                start = starts[i] + clip_len  # slack offset
                if tta:
                    # TTA counts support unconditionally per pass
                    rows = jnp.full((clip_len,), valid[i], jnp.int32)
                else:
                    rows = (jnp.sum(probs[i], axis=1) != 0).astype(jnp.int32)
                seg = jax.lax.dynamic_slice(
                    scores_buf, (start, 0), (clip_len, n_cls)
                )
                scores_buf = jax.lax.dynamic_update_slice(
                    scores_buf, seg + probs[i], (start, 0)
                )
                sseg = jax.lax.dynamic_slice(support_buf, (start,), (clip_len,))
                support_buf = jax.lax.dynamic_update_slice(
                    support_buf, sseg + rows, (start,)
                )
            return scores_buf, support_buf

        return acc_step

    def _spot_device(self, batches, t_len: int, bs: int, tta: bool):
        """Aggregate one video's windows on device; a single D2H at the end.

        Buffer lengths round up to 512-unit buckets so videos of similar
        length (e.g. SoccerNet halves) share one executable. Ragged last
        batches are zero-padded with a valid mask instead of a host-side
        slice, keeping every dispatch shape-identical and asynchronous.
        """
        import jax
        import jax.numpy as jnp

        clip_len = self.cfg.clip_len
        n_cls = len(self.classes) + 1
        buf_len = -(-(t_len + 2 * clip_len) // 512) * 512
        scores_buf = jnp.zeros((buf_len, n_cls), jnp.float32)
        support_buf = jnp.zeros((buf_len,), jnp.int32)

        for batch in batches:
            frames = np.stack([c["frame"] for c in batch], axis=0)
            starts = np.asarray([int(c["start"]) for c in batch], np.int32)
            n = len(batch)
            if n < bs:
                frames = np.concatenate(
                    [frames,
                     np.zeros((bs - n, *frames.shape[1:]), frames.dtype)],
                    axis=0,
                )
                starts = np.concatenate([starts, np.zeros(bs - n, np.int32)])
            valid = (np.arange(bs) < n).astype(np.float32)
            if self._mesh is not None:
                # shard the window batch over the serving mesh; the tiny
                # per-window accumulator updates replicate
                from tdeed_tpu.parallel.mesh import batch_sharding

                frames = jax.device_put(
                    frames, batch_sharding(self._mesh)
                )
            passes = [False, True] if tta else [False]
            for hflip in passes:
                scores_buf, support_buf = self._acc_step(
                    self._params, self._batch_stats, frames, starts, valid,
                    scores_buf, support_buf, hflip, tta,
                )
        scores, support = jax.device_get((scores_buf, support_buf))
        return (scores[clip_len:clip_len + t_len],
                support[clip_len:clip_len + t_len])

    # -- construction -----------------------------------------------------

    @classmethod
    def from_run(cls, model_name: str, config_root: str = "configs",
                 data_root: str = "data", **kw) -> "SpottingPredictor":
        """Load config + class map + best checkpoint of a finished run."""
        from tdeed_tpu.checkpoint import CheckpointManager

        cfg = load_config(model_name, config_root)
        classes = load_classes(
            os.path.join(data_root, cfg.dataset, "class.txt")
        )
        two_heads = None
        if cfg.pretrain is not None:
            two_heads = (cfg.num_classes + 1, cfg.pretrain.num_classes + 1)
        ckpt = CheckpointManager(
            cfg.save_dir or os.path.join("checkpoints", cfg.model)
        )
        restored = ckpt.restore_best()
        return cls(cfg, restored["params"], restored["batch_stats"],
                   classes, two_heads=two_heads, **kw)

    # -- inference --------------------------------------------------------

    def _windows(self, num_frames: int) -> List[int]:
        stride = self.spec.eval_stride
        clip_len = self.cfg.clip_len
        overlap = self.spec.eval_overlap_len(clip_len)
        hop = (clip_len - overlap) * stride
        # same enumeration as VideoWindows (ref: dataset/frame.py:409-423)
        return list(
            range(-DEFAULT_PAD_LEN * stride,
                  max(0, num_frames - overlap * stride), hop)
        )

    def spot(
        self,
        frame_dir: str,
        video: str,
        num_frames: Optional[int] = None,
        source_info: Optional[dict] = None,
        nms: str = "snms",  # 'nms' | 'snms' | 'none'
        threshold: float = 0.01,
        hflip_tta: Optional[bool] = None,
        device_aggregate: bool = True,
    ) -> List[dict]:
        """Spot events in one video. Returns [{label, frame, score}, ...]
        with frames in *strided* units (multiply by spec.eval_stride for
        source frames)."""
        from tdeed_tpu.infer.evaluate import predict_windows

        stride = self.spec.eval_stride
        clip_len = self.cfg.clip_len
        if num_frames is None:
            # Frame files are indexed in SOURCE-frame units (the extractor
            # renumbers to consecutive indices at the sampled fps), so the
            # file count IS num_frames — the data-layer stride applies on
            # top of it. Datasets whose videos share a frame directory
            # (tennis segments, finegym) cannot be counted this way.
            if self.cfg.dataset in ("tennis", "finegym"):
                raise ValueError(
                    f"{self.cfg.dataset} videos share frame directories; "
                    "pass num_frames explicitly (it is in the split JSON)"
                )
            path, frame0, nd = self.spec.scheme.resolve(
                frame_dir, video, source_info
            )
            num_frames = len(
                [f for f in os.listdir(path) if f.endswith(".jpg")]
            )
        if hflip_tta is None:
            hflip_tta = self.spec.hflip_tta

        t_len = math.ceil(num_frames / stride)
        starts = self._windows(num_frames)
        # TTA mirrors the reference's batch-1 protocol on one device
        # (ref: util/eval.py:32); on a serving mesh the batch stays a mesh
        # multiple — batching never changes per-window accumulations.
        bs = 1 if (hflip_tta and self._mesh is None) else self.batch_size

        def batches():
            for ofs in range(0, len(starts), bs):
                out = []
                for s in starts[ofs : ofs + bs]:
                    f = load_window(
                        self.spec, frame_dir, video, s, s + clip_len * stride,
                        stride, self.decoder, pad=True,
                        source_info=source_info, cache=self._cache,
                    )
                    if f is None:
                        continue
                    out.append(
                        {"video": video, "start": s // stride, "frame": f}
                    )
                if out:
                    yield out

        if device_aggregate:
            scores, support = self._spot_device(batches(), t_len, bs,
                                                bool(hflip_tta))
        else:
            # host accumulation, same inner loop as evaluation
            pred_dict = {
                video: (
                    np.zeros((t_len, len(self.classes) + 1), np.float32),
                    np.zeros(t_len, np.int32),
                )
            }

            def predict_fn(frames, hflip):
                if self._mesh is not None:
                    import jax

                    from tdeed_tpu.parallel.mesh import batch_sharding

                    frames = jax.device_put(
                        frames, batch_sharding(self._mesh)
                    )
                return self._predict(
                    self._params, self._batch_stats, frames, hflip
                )[1]

            predict_windows(predict_fn, pred_dict, batches(), bs, hflip_tta)
            scores, support = pred_dict[video]
        support = support.copy()
        support[support == 0] = 1
        probs = scores / support[:, None]
        # vectorized event extraction (frame-major, class-ascending order,
        # same as the t/c loop it replaces)
        tt, cc = np.nonzero(probs[:, 1:] >= threshold)
        events = [
            {"label": self.classes_inv[int(c) + 1], "frame": int(t),
             "score": float(probs[t, c + 1])}
            for t, c in zip(tt, cc)
        ]
        pred = [{"video": video, "events": events,
                 "fps": FPS_SN / stride if self.spec.external_labels else None}]
        windows = self.spec.windows
        if nms == "nms":
            pred = non_maximum_suppression(pred, windows[0], threshold)
        elif nms == "snms":
            pred = soft_non_maximum_suppression(pred, windows[1], threshold)
        return pred[0]["events"]

    def spot_many(self, frame_dir: str, videos: Sequence[dict],
                  **kw) -> Dict[str, List[dict]]:
        """Spot events in many videos ({'video', 'num_frames', ...} metas)."""
        out = {}
        for meta in videos:
            out[meta["video"]] = self.spot(
                frame_dir, meta["video"], meta.get("num_frames"),
                meta.get("_source_info"), **kw,
            )
        return out
