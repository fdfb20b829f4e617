"""Visual QA viewers for the fusion-path intermediates (CSF + DSAM).

These are the debugging surface for exactly the modules most at risk of silent
parity drift — capability parity with the reference's hooks:
  - csf_viewer_v2 (reference data_process.py:922-1016): per-round similarity
    maps, contribution counts, round result images
  - DSAModule.histogram_viewer / depth_region_viewer (custom_model.py:800-820)

All viewers consume the ON-DEVICE ops (ops/csf.py, ops/depth_decomp.py), so
what you see is what the model computes — not a host-side reimplementation.
Figures save to a path (headless-friendly); `save=None` calls plt.show().
"""

from __future__ import annotations

import argparse

import numpy as np


def _finish(fig, save):
    import matplotlib.pyplot as plt

    if save:
        fig.savefig(save, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return save
    plt.show()
    return None


def csf_viewer(images: np.ndarray, save: str | None = None):
    """Grid of per-round similarity maps + round result images.

    images: (N, H, W, C) float or uint8 modality stack (the reference feeds
    the depth-enhancement modalities here).
    Rows = rounds (one per standard image); columns = compared images (the
    standard image's own column is blank, like the reference), rightmost
    column = that round's winner-composited result image.
    """
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from ..ops.csf import csf_intermediates

    inter = {k: np.asarray(v) for k, v in csf_intermediates(jnp.asarray(images)).items()}
    n = images.shape[0]
    fig, axes = plt.subplots(n, n + 1, figsize=((n + 1) * 3.2, n * 2.6), squeeze=False)
    fig.suptitle("Cosine Similarity Fuse — intermediates (on-device ops)", fontsize=14)
    im = None
    for rnd in range(n):
        for j in range(n):
            ax = axes[rnd, j]
            ax.set_xticks([])
            ax.set_yticks([])
            if j == rnd:
                ax.set_title(f"img {j} (standard)", fontsize=8)
                continue
            im = ax.imshow(inter["sim"][rnd, j], cmap="jet", vmin=-1, vmax=1)
            ax.set_title(f"vs img {j}\ncontrib {int(inter['counts'][rnd, j])} px", fontsize=8)
        axr = axes[rnd, n]
        rr = inter["round_images"][rnd]
        rr = rr / max(rr.max(), 1e-6)
        axr.imshow(rr.squeeze(-1) if rr.shape[-1] == 1 else rr, cmap="gray" if rr.shape[-1] == 1 else None)
        axr.set_xticks([])
        axr.set_yticks([])
        axr.set_title(f"round {rnd} result\nweight {inter['weights'][rnd]:.3f}", fontsize=8)
        axes[rnd, 0].set_ylabel(f"round {rnd}")
    if im is not None:
        fig.colorbar(im, ax=axes[:, n].tolist(), shrink=0.8)
    return _finish(fig, save)


def dsam_histogram_viewer(
    depth: np.ndarray,
    ratio: float = 0.2,
    num_modes: int = 3,
    bins: int = 512,
    save: str | None = None,
):
    """Depth histogram with the selected mode centers and their decomposition
    windows overlaid (reference histogram_viewer, custom_model.py:800-807,
    plus the window arithmetic of :754-772)."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from ..ops.depth_decomp import depth_histogram, select_modes

    hist, lo, width = (np.asarray(v) for v in depth_histogram(jnp.asarray(depth, jnp.float32), bins))
    centers, valid = (np.asarray(v) for v in select_modes(jnp.asarray(hist), jnp.asarray(lo), jnp.asarray(width), num_modes))
    edges = lo + np.arange(bins + 1) * width

    fig, ax = plt.subplots(figsize=(9, 4))
    ax.bar(edges[:-1], hist, width=np.diff(edges), align="edge", color="#777")
    for i, (c, v) in enumerate(zip(centers, valid)):
        if not v:
            continue
        half = c * ratio / 2.0
        ax.axvline(c, color=f"C{i}", lw=1.5, label=f"mode {i}: {c:.1f}")
        ax.axvspan(max(0.0, c - half), c + half, color=f"C{i}", alpha=0.15)
    ax.set_title("Depth histogram + selected modes / windows")
    ax.set_xlabel("depth value")
    ax.set_ylabel("frequency")
    ax.legend(fontsize=8)
    return _finish(fig, save)


def dsam_region_viewer(
    depth: np.ndarray,
    ratio: float = 0.2,
    num_modes: int = 3,
    save: str | None = None,
):
    """Region masks produced by the full on-device decomposition
    (reference depth_region_viewer, custom_model.py:809-820)."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from ..ops.depth_decomp import dsam_region_masks

    masks, active = dsam_region_masks(
        jnp.asarray(depth, jnp.float32)[None], jnp.asarray([ratio], jnp.float32), num_modes=num_modes
    )
    masks, active = np.asarray(masks[0]), np.asarray(active[0])
    t1 = masks.shape[0]
    fig, axes = plt.subplots(1, t1 + 1, figsize=((t1 + 1) * 2.8, 3))
    axes[0].imshow(depth, cmap="viridis")
    axes[0].set_title("depth", fontsize=9)
    k = int(active.sum()) - 1  # slots < K are windows, slot K the remainder
    for i in range(t1):
        axes[i + 1].imshow(masks[i], cmap="gray", vmin=0, vmax=1)
        name = f"window {i}" if i < k else ("remainder" if i == k else "inactive")
        axes[i + 1].set_title(f"{name}\nactive={int(active[i])}", fontsize=9)
    for ax in axes:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.suptitle("DSAM depth region masks (on-device decomposition)")
    return _finish(fig, save)


def main():
    ap = argparse.ArgumentParser(description="Fusion-path visual QA viewers")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("csf", help="CSF intermediates for a modality stack")
    p1.add_argument("--images", nargs="+", required=True, help="modality image paths")
    p1.add_argument("--save", default="csf_qa.png")

    p2 = sub.add_parser("dsam", help="DSAM histogram + region masks for a depth map")
    p2.add_argument("--depth", required=True, help="depth image path (grayscale)")
    p2.add_argument("--ratio", type=float, default=0.2)
    p2.add_argument("--save_hist", default="dsam_hist_qa.png")
    p2.add_argument("--save_regions", default="dsam_regions_qa.png")

    args = ap.parse_args()
    import cv2

    if args.cmd == "csf":
        imgs = []
        for p in args.images:
            im = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            imgs.append(im[..., None].astype(np.float32))
        csf_viewer(np.stack(imgs), save=args.save)
        print(f"wrote {args.save}")
    else:
        depth = cv2.imread(args.depth, cv2.IMREAD_GRAYSCALE).astype(np.float32)
        dsam_histogram_viewer(depth, ratio=args.ratio, save=args.save_hist)
        dsam_region_viewer(depth, ratio=args.ratio, save=args.save_regions)
        print(f"wrote {args.save_hist} {args.save_regions}")


if __name__ == "__main__":
    main()
