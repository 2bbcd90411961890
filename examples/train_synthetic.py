"""End-to-end demo: train the topological audio autoencoder on a
synthetic NSynth-like corpus (no dataset download needed).

    python examples/train_synthetic.py [n_clips] [epochs]

Covers the full pipeline: corpus synthesis -> on-device O(N²) spectral
distance precompute -> contrastive curriculum dataset -> bf16 training
with the device-resident corpus -> eval + checkpoints + audio dumps.
"""

from __future__ import annotations

import sys

from topo_audio_autoencoder_tpu.data import (
    NSynthDataset,
    compute_distances,
    synth_corpus,
)
from topo_audio_autoencoder_tpu.models import AudioAutoencoder
from topo_audio_autoencoder_tpu.training import Trainer, TrainerConfig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    print(f"synthesizing {n} clips...")
    corpus = synth_corpus(n, 64000)
    print("precomputing pairwise spectral distances on device...")
    dists = compute_distances(corpus, tile=32)
    train = NSynthDataset(corpus, dists["neighbors"], train=True)
    val = NSynthDataset(synth_corpus(max(8, n // 8), 64000, seed=7), train=False)

    model = AudioAutoencoder.create(
        num_vertices=20, num_bands=16, sccn_hidden_dim=64
    )
    trainer = Trainer(
        model,
        train,
        val,
        config=TrainerConfig(
            checkpoint_dir="./checkpoints_synthetic",
            batch_size=16,
            accumulate_grad_batches=1,
            max_epochs=epochs,
            compute_dtype="bfloat16",
            log_every=10,
            checkpoint_every_iters=0,
        ),
    )
    metrics = trainer.train()
    print(f"train: {metrics.train_losses[0]:.3f} -> {metrics.train_losses[-1]:.3f}")
    print(f"best val {metrics.best_val_loss:.3f} @ epoch {metrics.best_epoch}")


if __name__ == "__main__":
    main()
