"""Training-curve plotting from trainer_state.json log histories.

Capability parity with plot_json_log.py (reference: :11-72 extractors,
:375-597 plot_multiple_training_metrics_with_category_map): multi-run overlay of
train/eval loss, LR + grad-norm twin axes, overall mAP, and paginated
per-category mAP curves. Our trainer writes HF-compatible trainer_state.json so
either stack's logs plot here.
"""

from __future__ import annotations

import json
import math
import os
from collections import defaultdict

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def load_log_history(trainer_state_path: str) -> list[dict]:
    with open(trainer_state_path) as f:
        return json.load(f)["log_history"]


def extract_series(log_history: list[dict], key: str, x_key: str = "epoch"):
    xs, ys = [], []
    for e in log_history:
        if key in e and x_key in e:
            xs.append(e[x_key])
            ys.append(e[key])
    return xs, ys


def per_category_map_keys(log_history: list[dict]) -> list[str]:
    skip = {
        "eval_map", "eval_map_50", "eval_map_75", "eval_map_small", "eval_map_medium",
        "eval_map_large",
    }
    keys = set()
    for e in log_history:
        for k in e:
            if k.startswith("eval_map_") and k not in skip:
                keys.add(k)
    return sorted(keys)


def plot_multiple_training_metrics(
    runs: dict[str, str],
    output_dir: str,
    categories_per_page: int = 6,
) -> list[str]:
    """runs: {run_name: trainer_state.json path}. Writes PNGs; returns paths."""
    os.makedirs(output_dir, exist_ok=True)
    hists = {name: load_log_history(p) for name, p in runs.items()}
    written = []

    # Page 1: losses + LR/grad-norm + overall mAP.
    fig, axes = plt.subplots(2, 2, figsize=(14, 10))
    for name, h in hists.items():
        axes[0, 0].plot(*extract_series(h, "loss"), label=f"{name} train")
        axes[0, 0].plot(*extract_series(h, "eval_loss"), "--", label=f"{name} eval")
        axes[0, 1].plot(*extract_series(h, "learning_rate"), label=name)
        ax2 = axes[0, 1].twinx()
        ax2.plot(*extract_series(h, "grad_norm"), ":", alpha=0.6)
        axes[1, 0].plot(*extract_series(h, "eval_map"), label=name)
        axes[1, 1].plot(*extract_series(h, "eval_map_50"), label=name)
    for ax, title in zip(axes.flat, ("loss", "lr (solid) / grad norm (dotted)", "eval mAP", "eval mAP@50")):
        ax.set_title(title)
        ax.set_xlabel("epoch")
        ax.legend(fontsize=8)
    fig.tight_layout()
    p = os.path.join(output_dir, "training_metrics.png")
    fig.savefig(p, dpi=110)
    plt.close(fig)
    written.append(p)

    # Per-category mAP pages.
    cat_keys = sorted(set().union(*[per_category_map_keys(h) for h in hists.values()]) if hists else [])
    pages = math.ceil(len(cat_keys) / categories_per_page) if cat_keys else 0
    for page in range(pages):
        keys = cat_keys[page * categories_per_page : (page + 1) * categories_per_page]
        cols = min(3, len(keys))
        rows = math.ceil(len(keys) / cols)
        fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 4 * rows), squeeze=False)
        for i, key in enumerate(keys):
            ax = axes[i // cols][i % cols]
            for name, h in hists.items():
                ax.plot(*extract_series(h, key), label=name)
            ax.set_title(key)
            ax.set_xlabel("epoch")
            ax.legend(fontsize=7)
        fig.tight_layout()
        p = os.path.join(output_dir, f"category_map_page{page + 1}.png")
        fig.savefig(p, dpi=110)
        plt.close(fig)
        written.append(p)
    return written
