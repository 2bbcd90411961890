"""On-device O(N²) pairwise spectral-distance precompute.

TPU-native replacement for the reference's offline distance stage
(reference: precompute_distances.py:51-153), which looped over 523,776
upper-triangle pairs in Python batches of 32, recomputing both STFTs for
every pair on CPU. Here:

- Each waveform's multiscale STFT is computed once per row-tile.
- The N×N matrix is filled tile-by-tile with
  ``spectral_distance_matrix_block`` — a single jitted broadcast per tile
  pair, embarrassingly parallel on the MXU/VPU (the BASELINE north star).
- Only the upper triangle is computed; the matrix is symmetrized on host.

Outputs match the reference's artifacts: the full distance matrix and, per
row, the complete nearest→farthest neighbor ordering
(precompute_distances.py:121-143) — saved as one ``.npz``.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.stft import DEFAULT_SCALES, spectral_distance_matrix_block


@functools.partial(jax.jit, static_argnames=("tile", "scales"))
def _tiled_upper(xs: jnp.ndarray, tile: int, scales: tuple[int, ...]) -> jnp.ndarray:
    """Upper-triangle tile sweep as ONE compiled scan.

    The naive per-block loop fetches every [tile, tile] block to host —
    a blocking round-trip per tile pair (n=2048, tile=64: 1024 syncs
    ≈ 560 s over the remote-TPU link, ~100% dispatch latency). One
    ``lax.scan`` over the static tile-pair list keeps the whole sweep
    on device; the only transfer is the final [N, N] matrix.
    """
    n, t = xs.shape
    nt = n // tile
    pairs = np.asarray(
        [(i, j) for i in range(nt) for j in range(i, nt)], dtype=np.int32
    )

    def body(out, ij):
        i0, j0 = ij[0] * tile, ij[1] * tile
        xi = lax.dynamic_slice(xs, (i0, 0), (tile, t))
        xj = lax.dynamic_slice(xs, (j0, 0), (tile, t))
        block = spectral_distance_matrix_block(xi, xj, scales)
        return lax.dynamic_update_slice(out, block, (i0, j0)), None

    out, _ = lax.scan(body, jnp.zeros((n, n), jnp.float32), jnp.asarray(pairs))
    return out


def compute_distance_matrix(
    waveforms: np.ndarray,
    tile: int = 64,
    scales: tuple[int, ...] = DEFAULT_SCALES,
) -> np.ndarray:
    """Full symmetric pairwise spectral-distance matrix.

    waveforms: [N, T] float32 (padded to equal length, like
    precompute_distances.py:77-86). Returns [N, N] float32 with zero
    diagonal. Note the distance is not symmetric in general (the linear
    term normalizes by x's energy); like the reference we compute d(i, j)
    with i as reference for i < j and mirror it (:113-115).
    """
    n = len(waveforms)
    tile = min(tile, n)
    pad = (-n) % tile
    xs = jnp.asarray(waveforms)
    if pad:
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
    out = np.array(_tiled_upper(xs, tile, scales)[:n, :n])  # writable host copy
    iu = np.triu_indices(n, 1)
    out[(iu[1], iu[0])] = out[iu]  # mirror upper -> lower
    np.fill_diagonal(out, 0.0)
    return out


def sort_neighbors(distances: np.ndarray) -> np.ndarray:
    """Per-row nearest→farthest ordering, self excluded
    (precompute_distances.py:121-125). Returns [N, N-1] int32."""
    n = len(distances)
    order = np.argsort(distances, axis=1, kind="stable")
    # drop the self column (distance 0 sorts first; guard against ties by
    # removing the true self index wherever it lands)
    result = np.empty((n, n - 1), dtype=np.int32)
    for i in range(n):
        row = order[i]
        result[i] = row[row != i][: n - 1]
    return result


def compute_distances(
    waveforms: np.ndarray,
    save_path: str | Path | None = None,
    tile: int = 64,
    scales: tuple[int, ...] = DEFAULT_SCALES,
) -> dict:
    """End-to-end precompute: distances + neighbor ordering (+ save).

    Mirrors ``compute_distances`` (precompute_distances.py:51-153); the
    ``.npz`` holds {'distances': [N,N], 'neighbors': [N,N-1]}.
    """
    distances = compute_distance_matrix(waveforms, tile, scales)
    neighbors = sort_neighbors(distances)
    result = {"distances": distances, "neighbors": neighbors}
    if save_path is not None:
        path = Path(save_path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path, **result)
    return result


def load_distances(path: str | Path) -> dict:
    with np.load(path) as z:
        return {"distances": z["distances"], "neighbors": z["neighbors"]}
