"""Bag player / frame curator (reference: intelRealSense/display.py:301-449).

Replays a RealSense .bag, producing per frame the 12 modalities the reference
curates: color, 2 depth colormaps, 3 RealSense filters (decimation, spatial,
hole-filling), and 6 enhancement ops (see depth_enhance). Interactive a/d/s/q
keyboard curation; saves PNG + NPY per modality into structured directories.
"""

from __future__ import annotations

import os

import numpy as np

from .depth_enhance import enhance_all


def _rs():
    try:
        import pyrealsense2 as rs

        return rs
    except ImportError as e:  # pragma: no cover
        raise ImportError("pyrealsense2 is required for bag playback.") from e


def do_depth_image_filter(rs, depth_frame) -> dict:
    """RealSense post-processing filters (reference :123-189)."""
    out = {}
    dec = rs.decimation_filter()
    dec.set_option(rs.option.filter_magnitude, 2)
    out["decimation"] = np.asanyarray(dec.process(depth_frame).get_data())
    spat = rs.spatial_filter()
    out["spatial"] = np.asanyarray(spat.process(depth_frame).get_data())
    hole = rs.hole_filling_filter()
    out["hole_filling"] = np.asanyarray(hole.process(depth_frame).get_data())
    return out


def do_depth_image_process(depth_u16: np.ndarray) -> dict:
    """Colormaps + enhancement modalities from the raw z16 depth (:104-120)."""
    import cv2

    gray = cv2.convertScaleAbs(depth_u16, alpha=0.03)
    out = {
        "colormap_jet": cv2.applyColorMap(gray, cv2.COLORMAP_JET),
        "colormap_bone": cv2.applyColorMap(gray, cv2.COLORMAP_BONE),
    }
    out.update(enhance_all(gray))
    return out


def save_frame(save_dir: str, index: int, modalities: dict[str, np.ndarray]) -> None:
    import cv2

    for name, arr in modalities.items():
        d = os.path.join(save_dir, name)
        os.makedirs(d, exist_ok=True)
        cv2.imwrite(os.path.join(d, f"{index}.png"), arr)
        np.save(os.path.join(d, f"{index}.npy"), arr)


def checkout(bag_path: str, save_dir: str, interactive: bool = True) -> int:
    """Replay a bag; curate frames (a=prev, d=next, s=save, q=quit). Returns
    number of saved frames. With interactive=False saves every frame."""
    rs = _rs()
    import cv2

    pipeline = rs.pipeline()
    config = rs.config()
    config.enable_device_from_file(bag_path, repeat_playback=False)
    pipeline.start(config)

    frames_cache = []
    try:
        while True:
            try:
                frames = pipeline.wait_for_frames(timeout_ms=1000)
            except RuntimeError:
                break
            depth = frames.get_depth_frame()
            color = frames.get_color_frame()
            if not depth or not color:
                continue
            modalities = {"color": np.asanyarray(color.get_data())}
            d16 = np.asanyarray(depth.get_data())
            modalities["depth_raw"] = d16
            modalities.update(do_depth_image_process(d16))
            modalities.update({k: v for k, v in do_depth_image_filter(rs, depth).items()})
            frames_cache.append(modalities)
    finally:
        pipeline.stop()

    saved = 0
    if not interactive:
        for i, m in enumerate(frames_cache):
            save_frame(save_dir, i, m)
            saved += 1
        return saved

    idx = 0  # pragma: no cover (requires display)
    while frames_cache:
        m = frames_cache[idx]
        cv2.imshow("checkout", m["color"])
        key = cv2.waitKey(0) & 0xFF
        if key == ord("q"):
            break
        if key == ord("a"):
            idx = max(0, idx - 1)
        elif key == ord("d"):
            idx = min(len(frames_cache) - 1, idx + 1)
        elif key == ord("s"):
            save_frame(save_dir, idx, m)
            saved += 1
    return saved


if __name__ == "__main__":  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--bag", required=True)
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--no-interactive", action="store_true")
    a = ap.parse_args()
    n = checkout(a.bag, a.save_dir, interactive=not a.no_interactive)
    print(f"saved {n} frames")
