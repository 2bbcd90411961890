"""Debug instrumentation: NaN/Inf detection, config-gated.

The reference enables ``torch.autograd.set_detect_anomaly(True)`` globally
at import time in six modules (SURVEY §5.2) — ~10x slowdown always-on. The
JAX equivalents are config flags, so detection here is opt-in and scoped.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def detect_anomalies(nans: bool = True, infs: bool = True):
    """Scoped jax_debug_nans/jax_debug_infs — the anomaly-mode analog."""
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finiteness check over a pytree (test/debug helper)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            keys = "/".join(str(p) for p in path)
            raise FloatingPointError(f"non-finite values in {name}:{keys}")


def finite_or_zero(x: jnp.ndarray) -> jnp.ndarray:
    """Replace non-finite entries with zero (guarded reductions)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def checked(fn, *, errors=None):
    """Wrap a jittable function with ``checkify`` runtime checks
    (NaN + out-of-bounds index + div-by-zero) — SURVEY §5.2's replacement
    for the reference's always-on autograd anomaly mode. Returns a
    function that raises on the first triggered check.

    Usage: ``checked(train_step)(state, batch, ...)`` — ~2x slowdown,
    debug only.
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.float_checks | checkify.index_checks | checkify.div_checks
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


@contextlib.contextmanager
def golden_precision():
    """Pin full fp32 MXU precision for CPU-vs-TPU golden comparisons.

    TPU fp32 matmuls/convs default to fast bf16-multiplication passes
    (~1e-2 rel error) — fine for training, wrong for parity checks.
    """
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        yield
    finally:
        jax.config.update(
            "jax_default_matmul_precision", old if old is not None else "default"
        )
