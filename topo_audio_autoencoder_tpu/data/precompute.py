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

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..ops.stft import DEFAULT_SCALES, spectral_distance_matrix_block


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
    out = np.zeros((n, n), dtype=np.float32)
    xs = jnp.asarray(waveforms)
    for i0 in range(0, n, tile):
        xi = xs[i0 : i0 + tile]
        for j0 in range(i0, n, tile):
            block = np.asarray(
                spectral_distance_matrix_block(xi, xs[j0 : j0 + tile], scales)
            )
            out[i0 : i0 + tile, j0 : j0 + tile] = block
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
