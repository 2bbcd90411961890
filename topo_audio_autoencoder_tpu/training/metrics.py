"""Training metrics: JSON-persisted curves + best-run bookkeeping.

Equivalent of the reference ``TrainingMetrics`` (reference: trainer.py:15-40):
train/val loss curves, per-iteration losses, best loss/epoch/params, saved as
``metrics.json``. Adds structured per-component logging (the reference prints
its loss components and gradient norms, trainer.py:296-298,313-397; here they
land in JSON-lines for tooling).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path


@dataclass
class TrainingMetrics:
    train_losses: list = field(default_factory=list)
    val_losses: list = field(default_factory=list)
    iteration_losses: list = field(default_factory=list)
    best_val_loss: float = float("inf")
    best_epoch: int = -1
    best_params: dict | None = None
    test_loss: float | None = None  # held-out set, scored once after training

    def save(self, directory: str | Path) -> None:
        path = Path(directory) / "metrics.json"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(asdict(self), indent=2))

    @classmethod
    def load(cls, directory: str | Path) -> "TrainingMetrics":
        path = Path(directory) / "metrics.json"
        if not path.exists():
            return cls()
        data = json.loads(path.read_text())
        return cls(**data)


class MetricWriter:
    """Append-only JSON-lines metric stream (one dict per step)."""

    def __init__(self, directory: str | Path, name: str = "train_log"):
        self.path = Path(directory) / f"{name}.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, step: int, payload: dict) -> None:
        record = {"step": step}
        for k, v in payload.items():
            if isinstance(v, dict):
                record[k] = {kk: float(vv) for kk, vv in v.items()}
            else:
                record[k] = float(v)
        with self.path.open("a") as f:
            f.write(json.dumps(record) + "\n")
