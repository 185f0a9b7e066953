"""Training-curve figures (the reference's only visualization surface).

The reference renders exactly one figure: GDCF_Final.py:99-117 plots
Precision/Recall/F1-vs-epoch next to Loss-vs-epoch after training. Here the
same capability is a generic utility over any metric history — it accepts
``Trainer.fit(...).history`` (stacked [epochs] device arrays) or the
``gdcf_train`` history dict, groups loss curves in a right-hand panel and
everything else on the left, and saves to a file instead of ``plt.show()``
(headless TPU hosts have no display).

matplotlib is imported lazily so the core framework never depends on it.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def plot_history(
    history: Dict[str, "np.ndarray"],
    path: str,
    metrics: Optional[Sequence[str]] = None,
    title: str = "Training curves",
):
    """Save a two-panel metrics/loss figure mirroring GDCF_Final.py:99-117.

    ``history`` maps metric name -> per-epoch values (any array-like; device
    arrays are pulled to host). ``metrics`` selects the left-panel curves;
    default = every non-loss scalar series. Keys containing ``loss`` always go
    to the right panel. Returns the matplotlib Figure.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "plot_history needs matplotlib (optional dependency)"
        ) from e

    series = {}
    for k, v in history.items():
        if k.startswith("_"):  # internal scalars (e.g. _param_checksum)
            continue
        arr = np.asarray(v)
        if arr.ndim == 1 and arr.size > 0 and np.issubdtype(arr.dtype, np.number):
            series[k] = arr
    loss_keys = sorted(k for k in series if "loss" in k)
    if metrics is None:
        metric_keys = sorted(k for k in series if "loss" not in k)
    else:
        metric_keys = [k for k in metrics if k in series]

    fig = plt.figure(figsize=(12, 6))
    ax = fig.add_subplot(1, 2, 1)
    for k in metric_keys:
        ax.plot(range(1, len(series[k]) + 1), series[k], label=k)
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Metric Value")
    ax.set_title(title)
    if metric_keys:
        ax.legend(fontsize=8)

    ax2 = fig.add_subplot(1, 2, 2)
    for k in loss_keys:
        ax2.plot(range(1, len(series[k]) + 1), series[k], label=k)
    ax2.set_xlabel("Epoch")
    ax2.set_ylabel("Loss Value")
    ax2.set_title("Loss vs. Epoch")
    if loss_keys:
        ax2.legend(fontsize=8)

    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return fig
