"""Summarize capacity-axis quality runs into one comparison table.

The round-3 corpus-scaling study (RESULTS.md) showed the flagship n=20
model is latent-capacity-bound past ~2k clips. This reads the per-epoch
probe stream (complex_stats.jsonl) + metrics.json of each run directory
and prints the cross-run table on the two metrics that are comparable
across capacity axes:

- probe_spectral: spectral distance on 4 fixed TRAIN clips (memorization)
- val_spectral:   spectral distance on 4 fixed VAL clips (generalization;
  pure spectral — the val *total* also carries complexity/entropy
  penalties whose scale moves with the simplex count)

Usage: python benchmarks/capacity_report.py DIR [DIR...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def load_run(d: Path) -> dict:
    stats = [
        json.loads(line)
        for line in (d / "complex_stats.jsonl").read_text().splitlines()
        if line.strip()
    ]
    metrics = json.loads((d / "checkpoints" / "metrics.json").read_text())
    epoch_rows = [r for r in stats if isinstance(r["epoch"], int) and r["epoch"] >= 0]

    def best(key):
        vals = [r[key] for r in epoch_rows if key in r]
        return min(vals) if vals else None

    first = stats[0] if stats else {}
    return {
        "name": d.name,
        "epochs": len(metrics.get("train_losses", [])),
        "best_val_total": metrics.get("best_val_loss"),
        "best_epoch": metrics.get("best_epoch"),
        "probe_spectral_start": first.get("probe_spectral"),
        "probe_spectral_best": best("probe_spectral"),
        "val_spectral_start": first.get("val_spectral"),
        "val_spectral_best": best("val_spectral"),
        "tetra_peak": max(
            (r.get("active_tetra", 0.0) for r in epoch_rows), default=None
        ),
    }


def main() -> None:
    runs = [load_run(Path(p)) for p in sys.argv[1:]]
    cols = [
        "name", "epochs", "best_epoch", "best_val_total",
        "probe_spectral_start", "probe_spectral_best",
        "val_spectral_start", "val_spectral_best", "tetra_peak",
    ]
    widths = {
        c: max(len(c), *(len(str(r.get(c))) for r in runs)) for c in cols
    }
    print(" | ".join(c.ljust(widths[c]) for c in cols))
    print("-+-".join("-" * widths[c] for c in cols))
    for r in runs:
        print(" | ".join(str(r.get(c)).ljust(widths[c]) for c in cols))


if __name__ == "__main__":
    main()
