"""Orbax checkpoint save/resume.

Capability parity with the reference's mmcv CheckpointHook + resume_from
(reference: configs/_base_/default_runtime.py:1 checkpoint_config,
tools/train.py:125-126/220-230 — checkpoints embed config text + class
meta).  Orbax writes sharding-aware, async-capable checkpoints; metadata
(config text, class names, epoch) rides alongside as msgpack.
"""
from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        self.directory = osp.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, meta: Optional[Dict] = None):
        args = {"state": ocp.args.StandardSave(state)}
        if meta:
            args["meta"] = ocp.args.JsonSave(meta)
        self._mgr.save(step, args=ocp.args.Composite(**args))

    def restore(self, state_template, step: Optional[int] = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)))
        meta = None
        try:
            meta = self._mgr.restore(
                step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
            )["meta"]
        except Exception:
            pass
        return restored["state"], meta

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
