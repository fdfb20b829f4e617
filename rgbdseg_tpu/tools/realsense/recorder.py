"""Rotating .bag recorder for Intel RealSense (reference: intelRealSense/
recorder.py:21-108): depth z16 + color bgr8 @ 1280x720x30fps, file rotation
every `interval` seconds, optional live colormap preview.

pyrealsense2 is not bundled in this image; the module degrades to a clear
ImportError at call time so the rest of the framework imports cleanly.
"""

from __future__ import annotations

import os
import time


def _rs():
    try:
        import pyrealsense2 as rs

        return rs
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "pyrealsense2 is required for sensor capture; install librealsense."
        ) from e


def recorder(save_dir: str, interval: float = 60.0, preview: bool = False) -> None:
    """Record rotating .bag files until interrupted."""
    rs = _rs()
    os.makedirs(save_dir, exist_ok=True)
    file_index = 0
    try:
        while True:
            pipeline = rs.pipeline()
            config = rs.config()
            config.enable_stream(rs.stream.depth, 1280, 720, rs.format.z16, 30)
            config.enable_stream(rs.stream.color, 1280, 720, rs.format.bgr8, 30)
            bag_path = os.path.join(save_dir, f"record_{file_index:04d}.bag")
            config.enable_record_to_file(bag_path)
            pipeline.start(config)
            t0 = time.time()
            try:
                while time.time() - t0 < interval:
                    frames = pipeline.wait_for_frames()
                    if preview:
                        _preview(rs, frames)
            finally:
                pipeline.stop()
            file_index += 1
    except KeyboardInterrupt:
        pass


def _preview(rs, frames) -> None:  # pragma: no cover
    import cv2
    import numpy as np

    depth = frames.get_depth_frame()
    color = frames.get_color_frame()
    if not depth or not color:
        return
    d = np.asanyarray(depth.get_data())
    c = np.asanyarray(color.get_data())
    dc = cv2.applyColorMap(cv2.convertScaleAbs(d, alpha=0.03), cv2.COLORMAP_JET)
    cv2.imshow("preview", np.hstack([c, dc]))
    cv2.waitKey(1)


if __name__ == "__main__":  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--save_dir", required=True)
    ap.add_argument("--interval", type=float, default=60.0)
    ap.add_argument("--preview", action="store_true")
    a = ap.parse_args()
    recorder(a.save_dir, a.interval, a.preview)
