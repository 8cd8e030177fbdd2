"""Orbax checkpointing: params + BN stats + optimizer state + step.

The reference saves model weights only (best-epoch ``state_dict`` —
ref: train_tdeed.py:226-238, model/modules.py:47-55), so a crashed run
restarts from scratch. Here the full ``TrainState`` plus the epoch counter
and the running best-criterion value are checkpointed, giving true
mid-training resume on top of the reference's best-checkpoint semantics.

Layout under ``save_dir``:
    checkpoint_best/   — best-criterion TrainState (parity with the
                         reference's checkpoint_best.pt)
    checkpoint_last/   — most recent epoch (resume point)
    train_meta.json    — {'epoch', 'best_criterion', 'history'}
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from tdeed_tpu.parallel.mesh import host_replica
from tdeed_tpu.train.state import TrainState

BEST = "checkpoint_best"
LAST = "checkpoint_last"
META = "train_meta.json"


def _checkpointer() -> ocp.Checkpointer:
    if jax.process_count() > 1:
        # Checkpoint IO is per-process-local by design: SAVES run on
        # process 0 only (cli/train.py gates them on is_main), while
        # RESTORES (--resume, restore_best) may run on any process reading
        # a complete checkpoint. Orbax's default save/restore synchronizes
        # ALL processes — a single-process call would hang on that barrier
        # — so scope each process to itself, with a per-process barrier
        # namespace (two single-process checkpointers sharing barrier keys
        # would cross-talk through the coordination service). The trees it
        # sees are already host numpy (host_replica): nothing collective
        # remains.
        pid = jax.process_index()
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=pid, active_processes={pid},
                barrier_sync_key_prefix=f"proc{pid}",
            ),
        )
    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: TrainState) -> None:
    """Write a TrainState checkpoint directory, keeping the previous one
    intact until the new save is complete (write-to-tmp then swap): a crash
    mid-save must never destroy the only resume point."""
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    # Orbax restores on the host by default; fetch to host before save so
    # device arrays serialize from one process. host_replica (not
    # device_get) so a multi-host-replicated state saves from process 0
    # alone without a collective.
    host_state = host_replica(state)
    _checkpointer().save(tmp, host_state)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def restore_state(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState against a template: the tree structure/dtypes
    are validated and restored arrays adopt the template's shardings. (A
    template-free restore would hand back raw Orbax containers — optax
    namedtuple states don't survive it, so it is not offered.)"""
    path = os.path.abspath(path)
    restored = _checkpointer().restore(path, item=host_replica(template))
    return jax.tree.map(lambda t, r: r, template, restored)


def save_params(path: str, params: Any, batch_stats: Any) -> None:
    """Weights-only checkpoint (the reference's state_dict equivalent);
    write-to-tmp-then-swap like save_state."""
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _checkpointer().save(
        tmp, {"params": host_replica(params), "batch_stats": host_replica(batch_stats)}
    )
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def restore_params(path: str) -> Dict[str, Any]:
    return _checkpointer().restore(os.path.abspath(path))


def overlay_tree(dst: Dict[str, Any], src: Dict[str, Any], path=()) -> None:
    """Overlay ``src`` leaves onto ``dst`` in place, validating that every
    source path exists in the destination with a matching shape."""
    import numpy as np

    for k, v in src.items():
        assert k in dst, f"missing {'/'.join(path + (k,))} in model tree"
        if isinstance(v, dict):
            overlay_tree(dst[k], v, path + (k,))
        else:
            assert tuple(dst[k].shape) == tuple(v.shape), (
                "/".join(path + (k,)), dst[k].shape, v.shape
            )
            dst[k] = np.asarray(v).astype(np.asarray(dst[k]).dtype)


def load_backbone(
    variables: Dict[str, Any], path: str, module: str = "features"
) -> Dict[str, Any]:
    """Overlay a pretrained-backbone checkpoint onto freshly-initialized
    model variables.

    ``path`` is an orbax dir holding ``{'params', 'batch_stats'}`` trees
    rooted at the backbone (tools/import_timm_weights.py output). The
    reference always builds its backbone with ImageNet-pretrained timm
    weights (ref: model/model.py:37-46); this is the explicit TPU-side
    equivalent. Shift-module ('gs') parameters have no timm counterpart and
    keep their init. Returns a new variables dict of host numpy arrays.
    """
    import numpy as np

    restored = restore_params(path)
    variables = jax.tree.map(np.asarray, dict(variables))
    overlay_tree(variables["params"][module], restored["params"], (module,))
    if restored.get("batch_stats"):
        overlay_tree(
            variables["batch_stats"][module], restored["batch_stats"], (module,)
        )
    return variables


class CheckpointManager:
    """Best/last checkpoint pair + metadata, reference-compatible semantics."""

    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)

    @property
    def meta_path(self) -> str:
        return os.path.join(self.save_dir, META)

    def load_meta(self) -> Dict[str, Any]:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as fp:
                return json.load(fp)
        return {"epoch": -1, "best_criterion": None, "history": []}

    def save_meta(self, meta: Dict[str, Any]) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as fp:
            json.dump(meta, fp, indent=2)
        os.replace(tmp, self.meta_path)

    def save_epoch(
        self,
        state: TrainState,
        epoch: int,
        record: Dict[str, Any],
        is_best: bool,
        best_criterion: Optional[float],
    ) -> None:
        meta = self.load_meta()
        meta["epoch"] = epoch
        meta["best_criterion"] = best_criterion
        meta["history"].append(record)
        save_state(os.path.join(self.save_dir, LAST), state)
        if is_best:
            save_params(
                os.path.join(self.save_dir, BEST), state.params, state.batch_stats
            )
        self.save_meta(meta)
        # loss.json parity: per-epoch history the reference stores alongside
        # checkpoints (ref: train_tdeed.py:226-229).
        with open(os.path.join(self.save_dir, "loss.json"), "w") as fp:
            json.dump(meta["history"], fp, indent=2, sort_keys=True)

    def restore_last(self, template: TrainState) -> tuple[TrainState, int]:
        """(state, next_epoch) — for resume; (template, 0) when nothing saved.

        A ``checkpoint_last`` without meta (interrupt-save before the first
        ``save_epoch``) still restores: the caller derives the exact
        epoch/batch position from ``state.step``, so next_epoch falls back
        to 0 rather than discarding the saved state."""
        last = os.path.join(self.save_dir, LAST)
        if not os.path.exists(last):
            return template, 0
        meta = self.load_meta()
        return restore_state(last, template), max(0, meta["epoch"] + 1)

    def restore_best(self) -> Dict[str, Any]:
        return restore_params(os.path.join(self.save_dir, BEST))
