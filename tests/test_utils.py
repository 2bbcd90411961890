"""Utils tests: profiling timer, anomaly scoping, finiteness helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo_audio_autoencoder_tpu.utils import (
    assert_finite_tree,
    detect_anomalies,
    finite_or_zero,
    time_fn,
)


def test_time_fn():
    f = jax.jit(lambda x: x @ x.T)
    stats = time_fn(f, jnp.ones((64, 64)), warmup=1, iters=3)
    assert set(stats) == {"p50", "mean", "min", "max"}
    assert 0 < stats["min"] <= stats["p50"] <= stats["max"]


def test_detect_anomalies_scoped():
    before = jax.config.jax_debug_nans
    with detect_anomalies():
        assert jax.config.jax_debug_nans is True
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.array(-1.0)) * 1.0
    assert jax.config.jax_debug_nans == before


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite_tree({"x": jnp.array([1.0, np.nan])}, "bad")


def test_checked_catches_nan():
    from topo_audio_autoencoder_tpu.utils import checked

    def bad(x):
        return jnp.log(x)  # nan for negative input

    f = checked(jax.jit(bad))
    np.testing.assert_allclose(np.asarray(f(jnp.array(1.0))), 0.0)
    with pytest.raises(Exception, match="nan"):
        f(jnp.array(-1.0))


def test_golden_precision_scoped():
    from topo_audio_autoencoder_tpu.utils import golden_precision

    with golden_precision():
        assert jax.config.jax_default_matmul_precision == "highest"


def test_finite_or_zero():
    x = jnp.array([1.0, np.inf, np.nan, -2.0])
    np.testing.assert_array_equal(
        np.asarray(finite_or_zero(x)), [1.0, 0.0, 0.0, -2.0]
    )


def test_wait_for_backend_reachable():
    """A healthy backend is detected on the first subprocess probe
    (platform pinned to cpu: the site plugin's programmatic config beats
    env vars, so the override must go through jax.config)."""
    from topo_audio_autoencoder_tpu.utils import wait_for_backend

    assert wait_for_backend(120.0, platform="cpu", probe_timeout=90.0)


def test_wait_for_backend_unreachable_gives_up():
    from topo_audio_autoencoder_tpu.utils import wait_for_backend

    msgs = []
    assert not wait_for_backend(
        12.0, platform="no_such_platform", poll=1.0, probe_timeout=30.0,
        log=msgs.append,
    )
    assert any("unreachable" in m for m in msgs)
