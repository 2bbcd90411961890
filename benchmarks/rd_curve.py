"""Rate-distortion curve for the topological codec (VERDICT r4 #4).

Pairs every trained bitrate point with a measured quality number. The
rate is the codec's fixed latent size: ceil(total_simplices / 8) bytes
per 4 s @ 16 kHz clip — 184 B at n=14, 775 B at n=20, 5,181 B at n=32
(~125,000 B raw PCM16; reference encoder.py:86-90 fixes S_total and
never measures a rate-distortion pair). Distortion is the hard-eval
spectral distance: encode in eval mode, threshold the latent at 0.5
(bit-for-bit what ``inference.pack_latent`` ships), decode via
``decode_from_probs``, score multiscale-spectral vs the input.

Two measurement sources, marked per row:

- ``live``: runs whose checkpoint weights exist on disk — restore
  'best' and hard-eval the shared held-out probe clips (the same
  4 val clips full_recipe probes: seed-0 corpus rows 2048+).
- ``probe_log``: runs from earlier rounds whose weights did not
  survive the round boundary (only sidecars/metrics/logs are
  committed). Their per-epoch ``complex_stats.jsonl`` recorded
  ``val_hard_spectral`` on those same 4 clips; the row reports it at
  the best-val epoch. Gumbel runs that predate the hard-probe column
  use ``val_spectral``, which IS the hard value for them: the Gumbel
  eval path emits exact {0, 1} probs (samplers.binary_gumbel,
  training=False), so threshold-at-0.5 is the identity — the round-4
  discrete table measured that gap at exactly 0.0.

Usage:
  python benchmarks/rd_curve.py [--clips N] [--runs name:dir,...]
      [--log-only]   # force the probe-log source even when weights
                     # exist (CPU-safe; one consistent 4-clip probe
                     # measurement across every row)
Writes benchmarks/RD_CURVE.json and prints one JSON row per point.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import json
import math
import jax, jax.numpy as jnp, numpy as np

# JAX_PLATFORMS=cpu in the env is beaten by the site plugin's
# programmatic TPU config (CLAUDE.md); honor it through the config API
# so a CPU smoke run never opens a TPU client under a live training job.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

T0 = time.time()
ROOT = os.path.dirname(os.path.abspath(__file__))

# name -> (dir, geometry fallbacks for pre-stamp checkpoints,
#          hard-column name in complex_stats.jsonl)
DEFAULT_RUNS = {
    "n14_gumbel": ("capacity_n14_c64", {"vertices": 14}, "val_hard_spectral"),
    "n20_gumbel": ("capacity_n20_c64",
                   {"vertices": 20, "layers": 6, "sampler": "gumbel"},
                   "val_spectral"),  # pre-hard-probe log; gumbel eval is binary
    "n20_l9_gumbel": ("capacity_n20_c64_l9",
                      {"vertices": 20, "layers": 9, "sampler": "gumbel"},
                      "val_spectral"),
    "n20_hc": ("discrete_hc", {}, "val_hard_spectral"),
    "n20_hc_learned": ("discrete_hc_learned", {}, "val_hard_spectral"),
    "n20_ste": ("discrete_ste", {}, "val_hard_spectral"),
    "n32_gumbel": ("capacity_n32_c64", {}, "val_hard_spectral"),
    "n32_l9_gumbel": ("capacity_n32_c64_l9", {}, "val_hard_spectral"),
    "n32_packed_gumbel": ("capacity_n32_c64_packed", {}, "val_hard_spectral"),
}


def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def probe_log_point(run_dir, hard_col):
    """(hard_spectral_at_best_epoch, best_epoch, actives) from the
    committed per-epoch probe log + metrics."""
    stats_f = os.path.join(run_dir, "complex_stats.jsonl")
    metrics_f = os.path.join(run_dir, "checkpoints", "metrics.json")
    if not (os.path.exists(stats_f) and os.path.exists(metrics_f)):
        return None
    best_epoch = json.load(open(metrics_f)).get("best_epoch", -1)
    rows = [json.loads(l) for l in open(stats_f) if l.strip()]
    rows = {r["epoch"]: r for r in rows if isinstance(r.get("epoch"), int)}
    row = rows.get(best_epoch)
    if row is None or hard_col not in row:
        return None
    actives = [row.get(f"active_{k}") for k in
               ("vertices", "edges", "triangles", "tetra")]
    return float(row[hard_col]), int(best_epoch), actives


def live_point(ck, geom, n_clips):
    """Restore 'best' and hard-eval the shared probe clips on device."""
    from topo_audio_autoencoder_tpu.data import synth_corpus
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.ops.stft import spectral_distance
    from topo_audio_autoencoder_tpu.topology.rectifier import RectifiedProbs

    n = geom.get("vertices", 20)
    model = AudioAutoencoder.create(
        num_vertices=n,
        num_bands=geom.get("bands", 16),
        sccn_hidden_dim=geom.get("hidden", 64),
        n_sccn_layers=geom.get("layers", 6),
        max_active_vertices=geom.get("max_active_vertices", n),
        sampler=geom.get("sampler", "gumbel"),
        hard=geom.get("hard", False),
        learned_hc=geom.get("learned_hc", False) or False,
        pack_capacities=geom.get("pack_capacities"),
    )
    params = ck.restore("best")["params"]
    corpus = synth_corpus(2048 + n_clips, n_samples=64000, seed=0)
    probe = jnp.asarray(corpus[2048 : 2048 + n_clips])[:, None, :]
    del corpus

    @jax.jit
    def hard_eval(params, x):
        dl = x.shape[-1] // model.num_bands
        enc = model.apply(
            params, x, 1.0, None, False,
            method=lambda m, a, t, r, tr: m.encode(a, t, r, tr),
        )
        hard = RectifiedProbs(
            *((p >= 0.5).astype(p.dtype) for p in enc.probs.ranks)
        )
        wav = model.apply(
            params, hard, dl, method=lambda m, pr, d: m.decode_from_probs(pr, d)
        )
        spec = spectral_distance(wav[:, 0], x[:, 0])
        active = jnp.concatenate(
            [h.sum(-1, keepdims=True) for h in hard.ranks], -1
        )
        return spec, active

    spec, active = jax.device_get(hard_eval(params, probe))
    return float(np.mean(spec)), [round(float(a), 1) for a in np.mean(active, 0)]


def main():
    from topo_audio_autoencoder_tpu.training.checkpoint import CheckpointManager

    n_clips = (
        int(sys.argv[sys.argv.index("--clips") + 1])
        if "--clips" in sys.argv else 4  # the probe-log clips, comparable
    )
    runs = DEFAULT_RUNS
    if "--runs" in sys.argv:
        runs = {}
        for item in sys.argv[sys.argv.index("--runs") + 1].split(","):
            name, d = item.split(":")
            runs[name] = (d, {}, "val_hard_spectral")

    rows = []
    for name, (rel, geom_default, hard_col) in runs.items():
        run_dir = os.path.join(ROOT, rel)
        ckdir = os.path.join(run_dir, "checkpoints")
        if not os.path.isdir(ckdir):
            log(f"{name}: no run at {rel}; skipped")
            continue
        ck = CheckpointManager(ckdir)
        extra = ck.load_extra("best") or {}
        geom = dict(geom_default)
        geom.update(extra.get("model") or {})
        n = geom.get("vertices", 20)
        best_epoch = (extra.get("train_state") or {}).get("epoch")
        have_weights = "--log-only" not in sys.argv and (
            os.path.isdir(os.path.join(ckdir, "best"))
            or os.path.isdir(os.path.join(ckdir, "best.swap"))
        )
        if have_weights:
            try:
                hard_spec, actives = live_point(ck, geom, n_clips)
                source = f"live({n_clips} clips)"
            except Exception as e:
                log(f"{name}: live eval failed ({type(e).__name__}: {e}); "
                    "falling back to probe log")
                have_weights = False
        if not have_weights:
            pt = probe_log_point(run_dir, hard_col)
            if pt is None:
                log(f"{name}: no weights and no usable probe log; skipped")
                continue
            hard_spec, best_epoch, actives = pt
            source = "probe_log(4 clips)"
            if hard_col == "val_spectral":
                source += " gumbel-binary-eval==hard"
        s_total = sum(math.comb(n, k) for k in range(1, 5))
        row = {
            "run": name,
            "vertices": n,
            "layers": geom.get("layers", 6),
            "sampler": geom.get("sampler", "gumbel"),
            "hard": bool(geom.get("hard", False)),
            "learned_hc": bool(geom.get("learned_hc", False) or False),
            "pack_capacities": geom.get("pack_capacities"),
            "bits_per_clip": s_total,
            "bytes_per_clip": (s_total + 7) // 8,
            "kbps": round(s_total / 4.0 / 1000.0, 3),  # 4 s clips
            "hard_spectral": round(hard_spec, 4),
            "mean_active": actives,
            "best_epoch": best_epoch,
            "source": source,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: (r["bits_per_clip"], r["hard_spectral"]))
    out = os.path.join(ROOT, "RD_CURVE.json")
    with open(out, "w") as f:
        json.dump({"held_out": "seed0 corpus rows 2048+ (the recipe's val probe)",
                   "rows": rows}, f, indent=1)
    log(f"wrote {out} ({len(rows)} points)")


if __name__ == "__main__":
    main()
