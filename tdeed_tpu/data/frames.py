"""Frame decoding: JPEG -> (H, W, 3) uint8 numpy, NHWC from the start.

Backends, in preference order:
  * 'native' — first-party C++ libjpeg(-turbo) batch decoder
    (tdeed_tpu/native/), releases the GIL, one thread per frame;
  * 'cv2'    — OpenCV imdecode (libjpeg-turbo under the hood, releases GIL);
  * 'pil'    — Pillow fallback.

The reference decodes with torchvision.io.read_image into CHW uint8
(ref: dataset/frame.py:270-272); we decode straight to HWC, the layout the
TPU model consumes, so no host-side transpose ever happens.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional

import numpy as np

_cv2 = None
_pil = None


def _get_cv2():
    global _cv2
    if _cv2 is None:
        import cv2

        _cv2 = cv2
    return _cv2


def _decode_cv2(path: str) -> np.ndarray:
    cv2 = _get_cv2()
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img[:, :, ::-1]  # BGR -> RGB


def _decode_pil(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def get_decoder(kind: str = "auto") -> Callable[[str], np.ndarray]:
    if kind in ("auto", "native"):
        try:
            from tdeed_tpu.native import jpeg as native_jpeg

            if native_jpeg.available():
                return native_jpeg.decode
        except Exception:
            if kind == "native":
                raise
    if kind in ("auto", "cv2"):
        try:
            _get_cv2()
            return _decode_cv2
        except Exception:
            if kind == "cv2":
                raise
    return _decode_pil


def _clip_frame_paths(paths: list, stride: int, pad: bool) -> List[Optional[str]]:
    """Expand a stored clip record into per-slot file paths (None = pad)."""
    base_path, start, pad_start, pad_end, ndigits, length = paths
    n_real = length - pad_start - pad_end
    out: List[Optional[str]] = [None] * pad_start
    for j in range(n_real):
        idx = start + j * stride
        if ndigits > 0:
            out.append(os.path.join(base_path, str(idx).zfill(ndigits) + ".jpg"))
        else:
            out.append(os.path.join(base_path, f"frame{idx}.jpg"))
    if pad:
        out.extend([None] * pad_end)
    return out


def load_clip(
    paths: list,
    stride: int,
    decoder: Callable[[str], np.ndarray],
    pad: bool = True,
    cache=None,
) -> np.ndarray:
    """Decode a stored clip record into (T, H, W, 3) uint8.

    paths = [base_path, found_start, pad_start, pad_end, ndigits, length]
    (the reference pickle format; ref: dataset/frame.py:355-382). Start is
    always zero-padded; end only when pad=True.

    Fast path: when the first-party C++ batch decoder is available, the whole
    clip decodes with C++ threads into one contiguous buffer (no per-frame
    Python overhead).

    cache: optional ``tdeed_tpu.data.loader.FrameCache`` — decoded frames
    are served from / inserted into the LRU; only misses decode. Falls back
    to the uncached path on any inconsistency (mid-clip resolution change,
    corrupt frame), so behavior is bit-identical with or without a cache.
    """
    slot_paths = _clip_frame_paths(paths, stride, pad)
    first_real = next((p for p in slot_paths if p is not None), None)
    assert first_real is not None, paths

    if cache is not None:
        out = _load_clip_cached(slot_paths, decoder, cache)
        if out is not None:
            return out

    try:
        from tdeed_tpu.native import jpeg as native_jpeg

        # The C++ batch path only when the caller actually selected the
        # native decoder — an explicit cfg.decoder='cv2'/'pil' must be
        # honored (different libjpeg backends give different IDCT pixels).
        if (
            (decoder is None or decoder is native_jpeg.decode)
            and native_jpeg.available()
        ):
            h, w = native_jpeg.probe(first_real)
            arr, n_ok = native_jpeg.decode_batch(slot_paths, h, w)
            expected = sum(1 for p in slot_paths if p is not None)
            if n_ok == expected:
                return arr
            # A present frame failed to decode (corrupt stream, or a
            # mid-clip resolution change vs the probed first frame): the
            # C++ path zero-fills it silently, indistinguishable from
            # padding — fall through to the per-frame decoder, which
            # raises a proper error for the offending file.
    except Exception:
        pass

    frames: List[np.ndarray] = []
    for p in slot_paths:
        if p is not None:
            frames.append(decoder(p))
    arr = np.stack(frames, axis=0)
    pad_start = paths[2]
    n_end = len(slot_paths) - pad_start - len(frames)
    if pad_start > 0 or n_end > 0:
        arr = np.pad(arr, ((pad_start, n_end), (0, 0), (0, 0), (0, 0)))
    return arr


def _load_clip_cached(
    slot_paths: List[Optional[str]],
    decoder: Callable[[str], np.ndarray],
    cache,
) -> Optional[np.ndarray]:
    """Assemble a clip from the decoded-frame LRU, decoding only misses.

    Returns None to make the caller fall back to the uncached path (shape
    inconsistency or a batch-decode failure, where the per-frame decoder
    raises the proper error). Output rows are always freshly allocated or
    copied — the returned clip never aliases cache storage.
    """
    hits = [cache.get(p) if p is not None else None for p in slot_paths]
    miss = [
        p if (p is not None and h is None) else None
        for p, h in zip(slot_paths, hits)
    ]
    n_miss = sum(1 for p in miss if p is not None)
    shape = next((h.shape for h in hits if h is not None), None)
    if any(h is not None and h.shape != shape for h in hits):
        return None

    native = None
    try:
        from tdeed_tpu.native import jpeg as native_jpeg

        # Same contract as the uncached fast path: C++ batch decode only
        # when the caller actually selected the native decoder.
        if (
            (decoder is None or decoder is native_jpeg.decode)
            and native_jpeg.available()
        ):
            native = native_jpeg
    except Exception:
        pass

    n = len(slot_paths)
    if n_miss > 0 and native is not None:
        first_miss = next(p for p in miss if p is not None)
        try:
            h, w = native.probe(first_miss)
        except Exception:
            return None
        if shape is None:
            shape = (h, w, 3)
        elif shape != (h, w, 3):
            return None
        # decode_batch zero-fills masked (None) slots, so the misses land
        # directly in their final clip slots; hits are copied over after.
        arr, n_ok = native.decode_batch(miss, h, w)
        if n_ok != n_miss:
            return None
        for i, (p, hit) in enumerate(zip(slot_paths, hits)):
            if hit is not None:
                arr[i] = hit
            elif p is not None:
                cache.put(p, arr[i].copy())
        return arr

    decoded = {}
    for p in miss:
        if p is None:
            continue
        try:
            d = decoder(p)
        except Exception:
            return None
        if shape is None:
            shape = d.shape
        elif d.shape != shape:
            return None
        decoded[p] = d
    if shape is None:
        return None  # all-pad clip: let the uncached path handle it
    out = np.zeros((n,) + tuple(shape), np.uint8)
    for i, (p, hit) in enumerate(zip(slot_paths, hits)):
        if hit is not None:
            out[i] = hit
        elif p is not None:
            out[i] = decoded[p]
            cache.put(p, decoded[p])
    return out


def load_window(
    spec,
    frame_dir: str,
    video: str,
    start: int,
    end: int,
    stride: int,
    decoder: Callable[[str], np.ndarray],
    pad: bool = True,
    source_info: Optional[dict] = None,
    cache=None,
) -> Optional[np.ndarray]:
    """Eval-time window read with missing-frame end padding
    (ref: dataset/frame.py:558-626). Returns None if no frame decoded.

    cache: optional FrameCache — eval windows overlap 75%
    (spec.eval_overlap_len), so consecutive windows re-decode most frames;
    the LRU serves the repeats from memory. np.stack below always copies,
    so the returned window never aliases cache storage."""
    path, frame0, ndigits = spec.scheme.resolve(frame_dir, video, source_info)
    frames: List[np.ndarray] = []
    n_pad_start = 0
    n_pad_end = 0
    for frame_num in range(start, end, stride):
        if frame_num < 0:
            n_pad_start += 1
            continue
        idx = frame0 + frame_num
        if ndigits > 0:
            fp = os.path.join(path, str(idx).zfill(ndigits) + ".jpg")
        else:
            fp = os.path.join(path, f"frame{idx}.jpg")
        if cache is not None:
            hit = cache.get(fp)
            if hit is not None:
                frames.append(hit)
                continue
        try:
            decoded = decoder(fp)
        except (FileNotFoundError, OSError):
            n_pad_end += 1
            continue
        if cache is not None:
            cache.put(fp, decoded)
        frames.append(decoded)
    if not frames:
        return None
    arr = np.stack(frames, axis=0)
    if n_pad_start > 0 or (pad and n_pad_end > 0):
        arr = np.pad(
            arr, ((n_pad_start, n_pad_end if pad else 0), (0, 0), (0, 0), (0, 0))
        )
    return arr
