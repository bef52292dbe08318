"""Training-curve plots from checkpoint history (Visualization.ipynb
equivalent — ref cells 1-8 plot loss/metrics from the Trainer's history
dict persisted inside checkpoints)."""

from __future__ import annotations

from typing import Dict, Optional


def plot_history(history: Dict, out_path: str,
                 title: Optional[str] = None) -> str:
    """Write a loss/metric curve PNG from a Trainer history dict."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    train_loss = [x for x in history["train"]["loss"] if x is not None]
    val_loss = [x for x in history["validation"]["loss"] if x is not None]

    fig, ax = plt.subplots(figsize=(7, 4))
    if train_loss:
        ax.plot(range(1, len(train_loss) + 1), train_loss, label="train")
    if val_loss:
        ax.plot(range(1, len(val_loss) + 1), val_loss, label="validation")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_title(title or history.get("params", {}).get("model_name",
                                                        "training"))
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_from_checkpoint(checkpoint_path: str, out_path: str) -> str:
    from ..train.checkpoint import load_checkpoint

    _, meta = load_checkpoint(checkpoint_path)
    if not meta or "history" not in meta:
        raise ValueError(f"no history in {checkpoint_path}")
    return plot_history(meta["history"], out_path)
