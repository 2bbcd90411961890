"""Decompose the reconstruction-loss parity gap (VERDICT r2 #7).

Round-2 measured CPU-golden vs TPU reconstruction-loss parity at 6.4e-4 —
above the BASELINE 1e-4 north star — and attributed it to "log-term
conditioning" without proof. This script supplies the quantified argument
by decomposing the spectral distance per SCALE and per TERM (relative-L2
linear vs L1-log) across four computations of the SAME inputs:

    cpu64-fft   float64 CPU, rfft STFT        <- the golden
    cpu32-fft   float32 CPU, rfft STFT        <- fp32 floor, same algorithm
    cpu32-mm    float32 CPU, matmul STFT      <- algorithm delta, same HW
    tpu32-mm    float32 TPU, matmul STFT      <- production TPU path

and sweeping ``log_epsilon``. The conditioning claim predicts:
- the linear term agrees ~1e-7 everywhere (energy-normalized, well
  conditioned);
- the log-term deviation is O(|dS| / (S + eps)) on near-zero STFT bins, so
  it (a) appears already between cpu32 and cpu64 on the *same* algorithm,
  and (b) shrinks ~linearly as eps grows.

Prints one JSON line per (computation, scale, eps) cell plus a verdict
line; the RESULTS.md parity table cites these numbers.

Replaces nothing in the reference — the reference's loss
(loss.py:27-54 via rave.core.AudioDistanceV1) has no parity story at all;
this bounds the rebuild's deviation from infinite precision.
"""

from __future__ import annotations

import json
import os
import pickle
import subprocess
import sys
import tempfile

import numpy as np

_WORKER = """
import sys, pickle
import jax
platform, x64, method = sys.argv[3], sys.argv[4] == "1", sys.argv[5]
jax.config.update("jax_platforms", platform)
jax.config.update("jax_enable_x64", x64)
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np
from topo_audio_autoencoder_tpu.ops import stft as stft_mod

payload = pickle.load(open(sys.argv[1], "rb"))
dtype = jnp.float64 if x64 else jnp.float32
x = jnp.asarray(payload["x"], dtype)
y = jnp.asarray(payload["y"], dtype)
eps_list = payload["eps_list"]
scales = tuple(payload["scales"])

def terms(x, y, eps):
    out = {}
    for s in scales:
        sx = stft_mod.stft_magnitude(x, s, method=method)
        sy = stft_mod.stft_magnitude(y, s, method=method)
        lin = ((sx - sy) ** 2).mean() / ((sx ** 2).mean() + 1e-7)
        log = jnp.abs(jnp.log(sx + eps) - jnp.log(sy + eps)).mean()
        out[s] = (lin, log)
    return out

res = {}
for eps in eps_list:
    t = jax.jit(lambda x, y: terms(x, y, eps))(x, y)
    res[eps] = {s: (float(l), float(g)) for s, (l, g) in t.items()}
np.save(sys.argv[2], np.array([res], dtype=object), allow_pickle=True)
print("DONE")
"""


def run_on(platform: str, x64: bool, method: str, payload: bytes) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".pkl") as f, \
         tempfile.NamedTemporaryFile(suffix=".npy") as out:
        f.write(payload)
        f.flush()
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        res = subprocess.run(
            [sys.executable, "-c", _WORKER, f.name, out.name, platform,
             "1" if x64 else "0", method],
            capture_output=True, text=True, timeout=900, env=env,
        )
        if "DONE" not in res.stdout:
            raise RuntimeError(res.stderr[-2000:])
        return np.load(out.name, allow_pickle=True)[0]


def main() -> None:
    rng = np.random.default_rng(0)
    t = 64000
    b = 4
    # Same construction as parity_check.py: a synthetic "reconstruction"
    # pair — y is a filtered, slightly detuned copy of x, so the STFT
    # difference field has realistic structure (many near-zero bins).
    base = rng.standard_normal((b, t)).astype(np.float64)
    kernel = np.hanning(33) / np.hanning(33).sum()
    x = np.stack([np.convolve(r, kernel, mode="same") for r in base])
    y = 0.9 * x + 0.05 * np.roll(x, 3, axis=-1)
    eps_list = [1e-7, 1e-5, 1e-3]
    scales = (2048, 1024, 512, 256, 128)
    payload = pickle.dumps(
        {"x": x, "y": y, "eps_list": eps_list, "scales": list(scales)}
    )

    runs = {}
    for tag, (plat, x64, method) in {
        "cpu64-fft": ("cpu", True, "fft"),
        "cpu32-fft": ("cpu", False, "fft"),
        "cpu32-mm": ("cpu", False, "matmul"),
        "tpu32-mm": ("axon", False, "matmul"),
    }.items():
        try:
            runs[tag] = run_on(plat, x64, method, payload)
            print(json.dumps({"ran": tag}), flush=True)
        except Exception as e:  # TPU may be busy; CPU cells still stand
            print(json.dumps({"failed": tag, "err": str(e)[:300]}), flush=True)

    gold = runs["cpu64-fft"]
    rows = []
    for tag, res in runs.items():
        if tag == "cpu64-fft":
            continue
        for eps in eps_list:
            for s in scales:
                lin_g, log_g = gold[eps][s]
                lin, log = res[eps][s]
                rows.append({
                    "vs_golden": tag, "eps": eps, "scale": s,
                    "lin_dev": float(abs(lin - lin_g)),
                    "log_dev": float(abs(log - log_g)),
                    "lin": lin, "log": log,
                })
                print(json.dumps(rows[-1]), flush=True)

    # Verdict: total-loss deviation per eps (sum over scales of both terms)
    for tag, res in runs.items():
        if tag == "cpu64-fft":
            continue
        for eps in eps_list:
            tot_dev = sum(
                abs(res[eps][s][0] - gold[eps][s][0])
                + abs(res[eps][s][1] - gold[eps][s][1])
                for s in scales
            )
            print(json.dumps(
                {"verdict": tag, "eps": eps, "total_dev": float(tot_dev)}
            ), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "parity_decompose.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
