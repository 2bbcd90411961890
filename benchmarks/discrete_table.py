"""Soft-vs-hard-eval table across discretization trainings (VERDICT r3 #2).

Reads the per-epoch probe streams (complex_stats.jsonl) of the three
matched quality runs — soft Gumbel (`capacity_n20_c64`), Hard Concrete
(`discrete_hc`), STE (`discrete_ste`), all corpus 2048 / enc 1e-3 /
dec 1e-3 / cpx 0.1 — and prints the codec-relevant comparison: spectral
distance of the decoded SOFT eval latent vs the decoded THRESHOLDED
latent (what `inference.Codec` actually ships; pack_latent binarizes at
0.5 — inference.py:117).

For the Gumbel and STE rows soft == hard by construction (their eval
paths already emit exact {0,1}); the Hard Concrete row is the one with a
real quantization gap. Emits a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

RUNS = (
    ("gumbel (soft)", "capacity_n20_c64"),
    ("hard_concrete", "discrete_hc"),
    ("hard_concrete (learned stretch)", "discrete_hc_learned"),
    ("STE (hard)", "discrete_ste"),
)


def load(out_dir: Path):
    rows = []
    stats = out_dir / "complex_stats.jsonl"
    if not stats.exists():
        return None
    for line in stats.read_text().splitlines():
        r = json.loads(line)
        if isinstance(r.get("epoch"), int) and r["epoch"] >= 0:
            rows.append(r)
    # dedupe resumed epochs, keep the last write
    rows = list({r["epoch"]: r for r in rows}.values())
    mj = out_dir / "checkpoints" / "metrics.json"
    best = {}
    if mj.exists():
        m = json.loads(mj.read_text())
        best = {"best_val_loss": m["best_val_loss"], "best_epoch": m["best_epoch"]}
    return rows, best


def main() -> None:
    base = Path(__file__).parent
    print("| training | best val total | val spectral (soft eval) | "
          "val spectral (hard eval) | quantization gap |")
    print("|---|---|---|---|---|")
    summary = {}
    for label, name in RUNS:
        got = load(base / name)
        if not got or not got[0]:
            print(f"| {label} | (run missing) | | | |")
            continue
        rows, best = got
        # epoch with the best soft val_spectral; report its hard twin
        b = min(rows, key=lambda r: r.get("val_spectral", 1e9))
        soft = b["val_spectral"]
        hard = b.get("val_hard_spectral", soft)  # pre-probe logs: soft==hard (gumbel)
        gap = hard - soft
        bv = best.get("best_val_loss")
        print(
            f"| {label} | {bv:.3f} (ep {best.get('best_epoch')}) | "
            f"{soft:.3f} (ep {b['epoch']}) | {hard:.3f} | {gap:+.3f} |"
        )
        summary[name] = {
            "best_val_loss": bv, "best_epoch": best.get("best_epoch"),
            "val_spectral_soft": soft, "val_spectral_hard": hard,
            "gap": round(gap, 4), "at_epoch": b["epoch"],
        }
    print()
    print(json.dumps(summary))
    (base / "DISCRETE_TABLE.json").write_text(json.dumps(summary, indent=1))


if __name__ == "__main__":
    sys.exit(main())
