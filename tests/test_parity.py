"""Golden parity: jitted vs eager execution of the full model.

SURVEY §4 item (d): the jitted train/eval computation must match unjitted
execution (the CPU-golden criterion; on-TPU parity is checked by the bench
against these goldens at 1e-4 reconstruction-loss tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo_audio_autoencoder_tpu.models import AudioAutoencoder
from topo_audio_autoencoder_tpu.topology import (
    build_tables,
    enforce_constraints_flat,
)

T = 1024


@pytest.fixture(scope="module")
def model():
    # smallest config that still exercises every stage: CPU compiles of
    # fwd+grad dominate the suite's wall clock
    return AudioAutoencoder.create(
        num_vertices=5, num_bands=4, sccn_hidden_dim=8, n_sccn_layers=1
    )


@pytest.fixture(scope="module")
def params(model):
    x = jnp.zeros((1, 1, T))
    return model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, 1.0, jax.random.PRNGKey(2), True,
    )


def test_forward_jit_matches_eager(model, params):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 1, T))

    def fwd(p, x):
        return model.apply(p, x, 1.0, None, False).waveform

    eager = fwd(params, x)
    jitted = jax.jit(fwd)(params, x)
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-5
    )


def test_grad_jit_matches_eager(model, params):
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 1, T))

    def loss(p):
        out = model.apply(p, x, 1.0, jax.random.PRNGKey(5), True,
                          rngs={"dropout": jax.random.PRNGKey(6)})
        return jnp.mean((out.waveform - x) ** 2)

    g_eager = jax.grad(loss)(params)
    g_jit = jax.jit(jax.grad(loss))(params)
    # rtol: jit fusion reassociates the SCCN combine's batched einsum
    # (mbsc,mcd->mbsd) differently from the eager dot sequence — measured
    # up to ~4e-4 relative on f32 gradient leaves of ~1e-2 magnitude.
    for a, b in zip(jax.tree.leaves(g_eager), jax.tree.leaves(g_jit)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_rectifier_jit_matches_eager():
    tables = build_tables(6)
    probs = jax.random.uniform(jax.random.PRNGKey(7), (3, tables.total_simplices))
    probs = jnp.where(probs < 0.3, 0.0, probs)
    eager = enforce_constraints_flat(probs, tables)
    jitted = jax.jit(lambda p: enforce_constraints_flat(p, tables))(probs)
    for a, b in zip(eager.ranks, jitted.ranks):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_vmap_matches_loop(model, params):
    """Batching is vmap-consistent: a batched forward equals per-sample
    forwards stacked (the masked-static design's core claim)."""
    x = jax.random.normal(jax.random.PRNGKey(8), (3, 1, T))
    batched = model.apply(params, x, 1.0, None, False).waveform
    singles = jnp.concatenate(
        [
            model.apply(params, x[i : i + 1], 1.0, None, False).waveform
            for i in range(3)
        ]
    )
    np.testing.assert_allclose(
        np.asarray(batched), np.asarray(singles), rtol=1e-4, atol=1e-5
    )
