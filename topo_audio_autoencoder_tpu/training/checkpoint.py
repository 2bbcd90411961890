"""Orbax checkpointing: params, optimizer state, metrics, epoch, PRNG key.

Replaces the reference's ``torch.save`` dict-of-state checkpoints
(reference: trainer.py:417-453) with Orbax. Preemption tolerance
(SURVEY §5.3-4) comes from the trainer's background-thread saves and the
crash-safe swap-rename here; cadence decisions stay in the trainer.

Layout: ``<dir>/<name>/`` contains the composite checkpoint; ``latest`` /
``best`` are plain names like the reference's (trainer.py:148-161).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _make_handler():
    # Flat zarr2 files, no OCDBT database: measured 1.8 s to serialize the
    # flagship 198 MB train state vs 7.6-13.8 s for the OCDBT default (the
    # chunk-manifest build is CPU-bound and this host has one core).
    # Restore auto-detects the on-disk format, so checkpoints written by
    # earlier revisions (OCDBT) stay loadable.
    return ocp.PyTreeCheckpointHandler(use_ocdbt=False, use_zarr3=False)


class CheckpointManager:
    """Thin wrapper over an Orbax checkpointer keyed by name.

    Saves are synchronous at this layer by design: the crash-safe
    swap-rename in ``save`` must wait for the serialize anyway, so an
    Orbax AsyncCheckpointer could never overlap anything here. Async
    checkpointing lives in the trainer (``Trainer.save_checkpoint``
    ``block=False``), which snapshots device-side and runs this whole
    save on a background thread (SURVEY §5.3)."""

    def __init__(self, directory: str | Path):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.Checkpointer(_make_handler())

    def _path(self, name: str) -> Path:
        return self.directory / name

    def _swap_path(self, name: str) -> Path:
        return self.directory / f"{name}.swap"

    def save(self, name: str, state: Any, extra: dict | None = None) -> None:
        """Save a pytree state (+ a small JSON sidecar of host metadata).

        Crash-safe overwrite: Orbax's ``force=True`` deletes the existing
        directory BEFORE writing the replacement, so a kill mid-save would
        lose the only durable snapshot under that name. Instead the new
        checkpoint is committed to ``<name>.swap`` (atomic inside Orbax —
        tmp + rename) and only then swapped over the old one; every crash
        window leaves either the old checkpoint or a complete ``.swap``
        (which ``restore``/``exists`` fall back to).

        The sidecar lives *next to* the checkpoint dir, not inside it:
        Orbax materializes the dir via tmp+rename, so writing into the
        final path while a save is in flight would corrupt it.
        """
        path = self._path(name)
        swap = self._swap_path(name)
        if swap.exists():
            shutil.rmtree(swap)
        self._ckptr.save(swap, jax.device_get(state))
        if path.exists():
            shutil.rmtree(path)
        swap.rename(path)
        if extra is not None:
            self._extra_path(name).write_text(json.dumps(extra))

    def _extra_path(self, name: str) -> Path:
        return self.directory / f"{name}.extra.json"

    def _resolve(self, name: str) -> Path:
        """The final dir, or a complete ``.swap`` left by a crash between
        the old checkpoint's removal and the swap rename."""
        path = self._path(name)
        if not path.exists() and self._swap_path(name).exists():
            return self._swap_path(name)
        return path

    def restore(self, name: str, template: Any = None) -> Any:
        """Restore by name; ``template`` gives dtypes/shapes (and
        distinguishes lists from tuples, which the on-disk tree loses)."""
        path = self._resolve(name)
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
        return self._resolve(name).exists()

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
