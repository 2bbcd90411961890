"""Rate-distortion curve for the topological codec (VERDICT r4 #4).

Pairs every trained bitrate point with a measured quality number: for
each trained run, restore the 'best' checkpoint, encode a SHARED set of
held-out clips in eval mode, threshold the latent at 0.5 (bit-for-bit
what ``inference.pack_latent`` ships), decode via
``decode_from_probs``, and score the pure multiscale-spectral distance
against the input. The rate is the codec's fixed latent size:
ceil(total_simplices / 8) bytes per clip (184 B at n=14, 775 B at n=20,
5,181 B at n=32 for a 4 s @ 16 kHz clip ≈ 125,000 B raw PCM16)
(reference: encoder.py:86-90 fixes S_total; the reference never
measures a rate-distortion pair).

Held-out clips: the val slice of the shared seed-0 synthetic corpus the
matched-recipe runs trained on (corpus 2048 -> clips 2048+). Runs
trained on other corpora are excluded from the table by default.

Usage:
  python benchmarks/rd_curve.py [--clips N] [--runs name:dir,...]
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
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

T0 = time.time()
ROOT = os.path.dirname(os.path.abspath(__file__))

# name -> (dir, geometry overrides for pre-stamp checkpoints)
DEFAULT_RUNS = {
    "n14_gumbel": ("capacity_n14_c64", {}),
    "n20_gumbel": ("capacity_n20_c64", {"vertices": 20, "layers": 6,
                                        "sampler": "gumbel", "hard": False}),
    "n20_l9_gumbel": ("capacity_n20_c64_l9", {"vertices": 20, "layers": 9,
                                              "sampler": "gumbel", "hard": False}),
    "n20_hc": ("discrete_hc", {}),
    "n20_hc_learned": ("discrete_hc_learned", {}),
    "n20_ste": ("discrete_ste", {}),
    "n32_gumbel": ("capacity_n32_c64", {}),
    "n32_l9_gumbel": ("capacity_n32_c64_l9", {}),
}


def log(m):
    print(f"[+{time.time()-T0:6.1f}s] {m}", file=sys.stderr, flush=True)


def main():
    from topo_audio_autoencoder_tpu.data import synth_corpus
    from topo_audio_autoencoder_tpu.models import AudioAutoencoder
    from topo_audio_autoencoder_tpu.ops.stft import spectral_distance
    from topo_audio_autoencoder_tpu.topology.rectifier import RectifiedProbs
    from topo_audio_autoencoder_tpu.training.checkpoint import CheckpointManager

    n_clips = (
        int(sys.argv[sys.argv.index("--clips") + 1])
        if "--clips" in sys.argv else 16
    )
    # Shared held-out clips: val rows of the matched-recipe corpus
    # (full_recipe: synth_corpus(2048 + 512, seed=0), train = [:2048]).
    corpus = synth_corpus(2048 + 512, n_samples=64000, seed=0)
    probe = jnp.asarray(corpus[2048 : 2048 + n_clips])[:, None, :]
    del corpus

    runs = DEFAULT_RUNS
    if "--runs" in sys.argv:
        runs = {}
        for item in sys.argv[sys.argv.index("--runs") + 1].split(","):
            name, d = item.split(":")
            runs[name] = (d, {})

    rows = []
    for name, (rel, geom_default) in runs.items():
        ckdir = os.path.join(ROOT, rel, "checkpoints")
        ck = CheckpointManager(ckdir)
        if not ck.exists("best"):
            log(f"{name}: no best checkpoint at {rel}; skipped")
            continue
        extra = ck.load_extra("best") or {}
        geom = dict(geom_default)
        geom.update(extra.get("model") or {})
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
        raw = ck.restore("best")
        params = raw["params"]
        log(f"{name}: restored (n={n}, sampler={geom.get('sampler')}, "
            f"epoch={extra.get('train_state', {}).get('epoch')})")

        @jax.jit
        def hard_eval(params, x, model=model):
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
            soft_wav = model.apply(
                params, enc, dl, False,
                method=lambda m, e, d, tr: m.decode(e, d, tr),
            )
            soft = spectral_distance(soft_wav[:, 0], x[:, 0])
            active = jnp.concatenate(
                [h.sum(-1, keepdims=True) for h in hard.ranks], -1
            )
            return spec, soft, active

        spec, soft, active = jax.device_get(hard_eval(params, probe))
        s_total = sum(math.comb(n, k) for k in range(1, 5))
        row = {
            "run": name,
            "vertices": n,
            "layers": geom.get("layers", 6),
            "sampler": geom.get("sampler", "gumbel"),
            "hard": bool(geom.get("hard", False)),
            "learned_hc": bool(geom.get("learned_hc", False) or False),
            "bits_per_clip": s_total,
            "bytes_per_clip": (s_total + 7) // 8,
            "kbps": round(s_total / 4.0 / 1000.0, 3),  # 4 s clips
            "hard_spectral": round(float(np.mean(spec)), 4),
            "soft_spectral": round(float(np.mean(soft)), 4),
            "quant_gap": round(float(np.mean(spec) - np.mean(soft)), 4),
            "mean_active": [round(float(a), 1) for a in np.mean(active, 0)],
            "best_epoch": extra.get("train_state", {}).get("epoch"),
            "n_clips": n_clips,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: (r["bits_per_clip"], r["hard_spectral"]))
    out = os.path.join(ROOT, "RD_CURVE.json")
    with open(out, "w") as f:
        json.dump({"clips": n_clips, "held_out": "seed0[2048:]",
                   "rows": rows}, f, indent=1)
    log(f"wrote {out} ({len(rows)} points)")


if __name__ == "__main__":
    main()
