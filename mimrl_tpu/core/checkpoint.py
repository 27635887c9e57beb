"""Checkpointing with true resume.

The reference saves best-valid / best-test snapshots but never writes
`latest_model_path`, so it cannot resume (ref: Solver.py:111, :514-531 —
SURVEY.md §5.3/§5.4). Here every snapshot carries
{epoch, params (3 groups), both optimizer states, feature banks, rng} —
everything the two-stage loop needs to continue bit-compatibly — and
`latest` is written every epoch.

Two storage backends (--ckpt_backend):

- ``msgpack`` (default): flax msgpack — structure-preserving restore
  against a live template (round-trips optax's nested NamedTuple states
  exactly), one portable file per slot.
- ``orbax``: async orbax checkpointing — the save runs on a background
  thread so the epoch loop is not blocked while the snapshot (params +
  both optimizer moments, ~3x model size) is written; the directory
  format is the multi-host-safe one used by large-scale TPU training.

Reads auto-detect the on-disk format, so a run saved with one backend
restores under either setting.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


class CheckpointManager:
    """Three slots, mirroring the reference's three paths
    (ref: Solver.py:108-111): best_valid, best_test, latest."""

    def __init__(self, task_path: str, backend: str = "msgpack"):
        assert backend in ("msgpack", "orbax"), backend
        self.task_path = task_path
        self.backend = backend
        self._orbax = None
        os.makedirs(task_path, exist_ok=True)

    def _path(self, slot: str) -> str:
        return os.path.join(self.task_path, f"{slot}_model.msgpack")

    def _orbax_path(self, slot: str) -> str:
        return os.path.abspath(
            os.path.join(self.task_path, f"{slot}_model.orbax"))

    def _orbax_ckptr(self):
        if self._orbax is None:
            import orbax.checkpoint as ocp

            self._orbax = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
        return self._orbax

    def _meta_path(self, slot: str) -> str:
        return os.path.join(self.task_path, f"{slot}_model.meta.json")

    def _write_meta(self, slot: str) -> None:
        """Sidecar marker: records which backend wrote last, with a
        monotonic counter — mtime comparisons break when checkpoints are
        copied/rsynced without timestamp preservation."""
        counter = 0
        meta = self._read_meta(slot)
        if meta:
            counter = int(meta.get("counter", 0))
        tmp = self._meta_path(slot) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"backend": self.backend, "counter": counter + 1}, f)
        os.replace(tmp, self._meta_path(slot))

    def _read_meta(self, slot: str) -> Optional[dict]:
        p = self._meta_path(slot)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def save(self, slot: str, state: Any) -> None:
        if self.backend == "orbax":
            import orbax.checkpoint as ocp

            self._orbax_ckptr().save(
                self._orbax_path(slot), args=ocp.args.StandardSave(state),
                force=True)
            self._write_meta(slot)
            return
        data = serialization.to_bytes(state)
        tmp = self._path(slot) + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, self._path(slot))
        self._write_meta(slot)

    def restore(self, slot: str, template: Any) -> Optional[Any]:
        """Restore into the structure of `template`; None if absent.
        The on-disk format is auto-detected (msgpack file vs orbax dir);
        when BOTH exist (a run switched --ckpt_backend mid-life without
        cleaning up), the most recently written one wins — otherwise a
        stale old-format snapshot would silently shadow newer state.
        'Most recent' comes from the sidecar meta marker when present
        (robust to copied/rsynced trees), mtime otherwise."""
        path = self._path(slot)
        opath = self._orbax_path(slot)
        has_msgpack = os.path.exists(path)
        has_orbax = os.path.isdir(opath)
        if has_msgpack and has_orbax:
            meta = self._read_meta(slot)
            if meta and meta.get("backend") in ("msgpack", "orbax"):
                has_msgpack = meta["backend"] == "msgpack"
            else:
                has_msgpack = os.path.getmtime(path) >= os.path.getmtime(opath)
            has_orbax = not has_msgpack
        if has_msgpack:
            with open(path, "rb") as f:
                restored = serialization.from_bytes(template, f.read())
            # from_bytes hands back NUMPY leaves. Bit-identical, but
            # eager (non-jit) optax math then runs under numpy's type
            # promotion instead of JAX's weak typing — with bf16
            # moments (--moment_dtype bfloat16), `decay * mu` promotes
            # to f64 under numpy vs staying bf16 under JAX, so a
            # restored state would "continue" at different precision
            # outside jit. Converting here restores the save-time array
            # kind; inside jit (every solver step) both were already
            # identical, and the device upload happens at first use
            # either way.
            import jax.numpy as jnp

            return jax.tree_util.tree_map(
                lambda x: (jnp.asarray(x)
                           if isinstance(x, (np.ndarray, np.generic))
                           else x), restored)
        if has_orbax:
            import orbax.checkpoint as ocp

            self.wait_until_finished()
            return self._orbax_ckptr().restore(
                opath, args=ocp.args.StandardRestore(template))
        return None

    def exists(self, slot: str) -> bool:
        return (os.path.exists(self._path(slot))
                or os.path.isdir(self._orbax_path(slot)))

    def wait_until_finished(self) -> None:
        """Block until pending async (orbax) saves are durable."""
        if self._orbax is not None:
            self._orbax.wait_until_finished()

    def save_config(self, cfg_json: str) -> None:
        with open(os.path.join(self.task_path, "config.json"), "w") as f:
            f.write(cfg_json)

    def load_config(self) -> Optional[dict]:
        p = os.path.join(self.task_path, "config.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)
