"""Orbax checkpointing: params, optimizer state, metrics, epoch, PRNG key.

Replaces the reference's ``torch.save`` dict-of-state checkpoints
(reference: trainer.py:417-453) with Orbax. Async-capable saves give
preemption tolerance (SURVEY §5.3-4); cadence decisions stay in the trainer.

Layout: ``<dir>/<name>/`` contains the composite checkpoint; ``latest`` /
``best`` are plain names like the reference's (trainer.py:148-161).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over an Orbax checkpointer keyed by name.

    ``use_async=True`` saves in a background thread (preemption tolerance
    without blocking the train loop, SURVEY §5.3); in-flight saves are
    finalized by ``wait()`` / the next save / interpreter exit.
    """

    def __init__(self, directory: str | Path, use_async: bool = False):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
            if use_async
            else ocp.PyTreeCheckpointer()
        )
        self._async = use_async

    def _path(self, name: str) -> Path:
        return self.directory / name

    def save(self, name: str, state: Any, extra: dict | None = None) -> None:
        """Save a pytree state (+ a small JSON sidecar of host metadata).

        The sidecar lives *next to* the checkpoint dir, not inside it:
        Orbax materializes the dir via tmp+rename, so writing into the
        final path while an async save is in flight would corrupt it.
        """
        path = self._path(name)
        self._ckptr.save(path, jax.device_get(state), force=True)
        if extra is not None:
            self._extra_path(name).write_text(json.dumps(extra))

    def _extra_path(self, name: str) -> Path:
        return self.directory / f"{name}.extra.json"

    def wait(self) -> None:
        """Block until any in-flight async save is durable."""
        if self._async:
            self._ckptr.wait_until_finished()

    def restore(self, name: str, template: Any = None) -> Any:
        """Restore by name; ``template`` gives dtypes/shapes (and
        distinguishes lists from tuples, which the on-disk tree loses)."""
        self.wait()
        path = self._path(name)
        if template is not None:
            target = jax.tree.map(np.asarray, jax.device_get(template))
            restored = self._ckptr.restore(path, item=target)
        else:
            restored = self._ckptr.restore(path)
        return restored

    def load_extra(self, name: str) -> dict | None:
        p = self._extra_path(name)
        if not p.exists():  # legacy layout: sidecar inside the dir
            p = self._path(name) / "extra.json"
        return json.loads(p.read_text()) if p.exists() else None

    def exists(self, name: str) -> bool:
        return self._path(name).exists()

    def latest_epoch_name(self, prefix: str = "epoch_") -> str | None:
        """Most recent ``epoch_N`` checkpoint — per-combo resume during
        tuning (reference trainer.py:462-469)."""
        best_n, best = -1, None
        for p in self.directory.glob(f"{prefix}*"):
            if not p.is_dir():  # skip .extra.json sidecars
                continue
            try:
                n = int(p.name.split("_")[1])
            except (IndexError, ValueError):
                continue
            if n > best_n:
                best_n, best = n, p.name
        return best
