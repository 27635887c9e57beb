"""Checkpointing with true resume.

The reference saves best-valid / best-test snapshots but never writes
`latest_model_path`, so it cannot resume (ref: Solver.py:111, :514-531 —
SURVEY.md §5.3/§5.4). Here every snapshot carries
{epoch, params (3 groups), both optimizer states, feature banks, rng} —
everything the two-stage loop needs to continue bit-compatibly — and
`latest` is written every epoch.

Serialization uses flax msgpack (structure-preserving restore against a
live template, which round-trips optax's nested NamedTuple states
exactly). An orbax-based variant would work too; msgpack keeps the
checkpoint a single portable file per slot.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from flax import serialization


class CheckpointManager:
    """Three slots, mirroring the reference's three paths
    (ref: Solver.py:108-111): best_valid, best_test, latest."""

    def __init__(self, task_path: str):
        self.task_path = task_path
        os.makedirs(task_path, exist_ok=True)

    def _path(self, slot: str) -> str:
        return os.path.join(self.task_path, f"{slot}_model.msgpack")

    def save(self, slot: str, state: Any) -> None:
        data = serialization.to_bytes(state)
        tmp = self._path(slot) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, self._path(slot))

    def restore(self, slot: str, template: Any) -> Optional[Any]:
        """Restore into the structure of `template`; None if absent."""
        path = self._path(slot)
        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())

    def exists(self, slot: str) -> bool:
        return os.path.exists(self._path(slot))

    def save_config(self, cfg_json: str) -> None:
        with open(os.path.join(self.task_path, "config.json"), "w") as f:
            f.write(cfg_json)

    def load_config(self) -> Optional[dict]:
        p = os.path.join(self.task_path, "config.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
