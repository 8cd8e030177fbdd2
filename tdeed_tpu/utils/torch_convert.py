"""Torch <-> Flax weight layout conversions.

Used by the timm-checkpoint importer (tools/import_timm_weights.py) and by
the golden parity tests (tests/). All functions take/return numpy arrays.

Layout conventions:
  torch Conv2d weight: (out, in/groups, kh, kw)   -> flax: (kh, kw, in/g, out)
  torch Conv1d weight: (out, in/groups, k)        -> flax: (k, in/g, out)
  torch Conv3d weight: (out, in/groups, kt,kh,kw) -> flax: (kt,kh,kw, in/g, out)
  torch Linear weight: (out, in)                  -> flax Dense: (in, out)
"""

from __future__ import annotations

import numpy as np


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def conv3d_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def dense_from_conv1x1(w: np.ndarray) -> np.ndarray:
    """torch Conv1d(in, out, 1) weight (out, in, 1) -> Dense kernel (in, out)."""
    return np.transpose(w[:, :, 0], (1, 0))


def norm_vec(w: np.ndarray) -> np.ndarray:
    """Any (1, C, 1)/(C,)-shaped norm affine parameter -> (C,)."""
    return np.reshape(w, (-1,))
