"""Checkpointing: orbax top-k + last, plus reference-.pth interchange.

Covers the reference's ModelCheckpoint(top-3 + save_last monitoring
val_loss) (audio_train.py:145-153), the manual optimizer/scheduler-state
restore it needed (audio_train.py:91-99) — here optimizer + scheduler
state are always part of the checkpoint — and the portable
``serialize() -> best_model.pth`` export (base_model.py:159-173,
audio_train.py:204-213) readable by the PyTorch ecosystem.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

import orbax.checkpoint as ocp

from tdanet_tpu.system.trainer import TrainState


class CheckpointManager:
    """Top-k-by-val-loss + always-keep-last, with host-side extras
    (epoch, scheduler state, config) stored alongside."""

    def __init__(self, exp_dir: str, top_k: int = 3):
        self.exp_dir = os.path.abspath(exp_dir)
        os.makedirs(self.exp_dir, exist_ok=True)
        # The two managers save CONCURRENTLY (async) under multi-process:
        # each generates coordination-service barrier keys from its own
        # counter, so without distinct prefixes both emit e.g.
        # `_async_write_complete.0` and the pod dies with "Barrier ...
        # is already ongoing" (observed: 2-process recovery test, rank 1
        # killed mid-save -> peer stuck at the commit barrier).
        self._best = ocp.CheckpointManager(
            os.path.join(self.exp_dir, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=top_k,
                best_fn=lambda m: m["val_loss"],
                best_mode="min",
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="best")))
        self._last = ocp.CheckpointManager(
            os.path.join(self.exp_dir, "last"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="last")))

    def save(self, step: int, state: TrainState, val_loss: float,
             extras: Optional[Dict[str, Any]] = None):
        payload = state._asdict()
        self._best.save(step, args=ocp.args.StandardSave(payload),
                        metrics={"val_loss": float(val_loss)})
        self._last.save(step, args=ocp.args.StandardSave(payload))
        if extras is not None:
            with open(os.path.join(self.exp_dir, "extras.json"), "w") as f:
                json.dump(_jsonable(extras), f, indent=2)

    def wait(self):
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    def best_step(self):
        return self._best.best_step()

    def all_best_steps(self):
        return sorted(self._best.all_steps())

    @staticmethod
    def _reshard(restored, template):
        """Place restored arrays on the template's shardings (the restore
        may land everything on one device while training ran sharded)."""
        import jax

        def place(r, t):
            if hasattr(t, "sharding"):
                return jax.device_put(r, t.sharding)
            return r
        return jax.tree_util.tree_map(place, restored, template._asdict())

    def restore_last(self, template: TrainState) -> tuple[TrainState, int]:
        step = self._last.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.exp_dir}")
        restored = self._last.restore(
            step, args=ocp.args.StandardRestore(template._asdict()))
        return TrainState(**self._reshard(restored, template)), step

    def restore_best(self, template: TrainState) -> tuple[TrainState, int]:
        step = self._best.best_step()
        restored = self._best.restore(
            step, args=ocp.args.StandardRestore(template._asdict()))
        return TrainState(**self._reshard(restored, template)), step

    def load_extras(self) -> Dict[str, Any]:
        path = os.path.join(self.exp_dir, "extras.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {}

    def close(self):
        self._best.close()
        self._last.close()


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def export_torch_pth(model, params, path: str):
    """Write the reference-schema best_model.pth via torch.save so the
    PyTorch ecosystem can load our trained weights."""
    import torch

    conf = model.serialize(params)
    conf["state_dict"] = {
        k: torch.from_numpy(np.asarray(v).copy())
        for k, v in conf["state_dict"].items()
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(conf, path)
    return path
