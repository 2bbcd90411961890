"""TPU probe: learned-stretch fused Hard Concrete kernel (VERDICT r4 #7).

Checks, on the real chip (the on-chip PRNG has no CPU interpret lowering):

1. PARITY: the learned kernel with beta/gamma/zeta rows pinned to the
   fixed kernel's constants (2/3, -0.1, 1.1) reproduces the fixed kernel
   bit-for-bit — same seed, same PRNG stream, same math.
2. Distribution sanity at a non-trivial learned stretch: finite, in
   [0, 1], positive mass at both clip boundaries, monotone in logits.
3. A/B: fused learned sampler vs the pure-JAX learned sampler inside a
   jitted encode-like chain, chain-length-slope timed (utils.chain_time).

Prints one JSON line per check. Usage: python benchmarks/probe_learned_kernel.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax
import jax.numpy as jnp
import numpy as np

from topo_audio_autoencoder_tpu.ops import pallas_kernels as pk
from topo_audio_autoencoder_tpu.ops import samplers
from topo_audio_autoencoder_tpu.utils import chain_time


def main():
    assert jax.default_backend() == "tpu", "probe requires the TPU"
    rng = np.random.default_rng(0)
    b, s = 32, 6195  # flagship logit shape
    logits = jnp.asarray(rng.standard_normal((b, s)), jnp.float32)
    seed = jnp.asarray(123, jnp.int32)

    # 1. bit-for-bit parity at the fixed kernel's constants
    fixed = pk._hard_concrete_pallas_call(
        logits, seed, jnp.asarray(2.0 / 3.0), gamma=-0.1, zeta=1.1
    )
    learned = pk._hard_concrete_learned_pallas_call(
        logits, seed,
        jnp.full((s,), 2.0 / 3.0, jnp.float32),
        jnp.full((s,), -0.1, jnp.float32),
        jnp.full((s,), 1.1, jnp.float32),
    )
    exact = bool(jnp.array_equal(fixed, learned))
    print(json.dumps({"check": "parity_at_defaults", "bit_exact": exact}),
          flush=True)

    # 2. distribution sanity at a learned (per-rank-like) stretch
    beta = jnp.asarray(0.3 + 0.6 * rng.random(s), jnp.float32)
    gamma = jnp.asarray(-0.05 - 0.2 * rng.random(s), jnp.float32)
    zeta = jnp.asarray(1.02 + 0.3 * rng.random(s), jnp.float32)
    z = np.asarray(
        pk._hard_concrete_learned_pallas_call(logits, seed, beta, gamma, zeta)
    )
    q = np.quantile(np.asarray(logits), [0.1, 0.9])
    print(json.dumps({
        "check": "distribution",
        "finite": bool(np.isfinite(z).all()),
        "in_range": bool((z >= 0).all() and (z <= 1).all()),
        "frac0": round(float((z == 0).mean()), 4),
        "frac1": round(float((z == 1).mean()), 4),
        "monotone": bool(
            z[np.asarray(logits) > q[1]].mean()
            > z[np.asarray(logits) < q[0]].mean()
        ),
    }), flush=True)

    # 3. A/B: fused vs pure-JAX learned sampler (fwd+bwd), slope-timed
    key = jax.random.PRNGKey(0)

    def sample_fused(x, k):
        return pk.hard_concrete_fused_learned_diff(x, k, beta, gamma, zeta, True)

    def sample_pure(x, k):
        return samplers.hard_concrete(
            x, k, beta,
            samplers.HardConcreteParams(gamma=gamma, zeta=zeta), True,
        )

    for name, fn in (("fused", sample_fused), ("pure_jax", sample_pure)):
        grad = jax.jit(jax.grad(lambda x, k: fn(x, k).sum()))

        def make_step():
            state = {"x": logits}

            def step(i):
                # dependent chain: each sample-grad feeds the next logits
                state["x"] = state["x"] + 0.001 * grad(
                    state["x"], jax.random.fold_in(key, i)
                )
                return state["x"]

            return step

        ms = chain_time(make_step) * 1e3
        print(json.dumps({"check": "ab_fwd_bwd", "variant": name,
                          "ms_per_sample_step": round(ms, 4)}), flush=True)


if __name__ == "__main__":
    main()
