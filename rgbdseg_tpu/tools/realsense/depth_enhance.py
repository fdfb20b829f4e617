"""Depth-image enhancement ops used by the frame curator (hardware-free, cv2).

Parity targets (reference: intelRealSense/display.py):
- adaptive histogram equalization (AHE/CLAHE)        (:33-42)
- linear transform                                   (:45-54)
- gamma transform                                    (:57-67)
- Laplacian sharpening                               (:70-79)
- Gaussian-subtract (unsharp) enhancement            (:82-90)
- histogram equalization                             (:23-30)
"""

from __future__ import annotations

import cv2
import numpy as np


def hist_equalize(gray: np.ndarray) -> np.ndarray:
    return cv2.equalizeHist(gray.astype(np.uint8))


def adaptive_hist_equalize(gray: np.ndarray, clip_limit: float = 2.0, tile: int = 8) -> np.ndarray:
    clahe = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=(tile, tile))
    return clahe.apply(gray.astype(np.uint8))


def linear_transform(gray: np.ndarray, alpha: float = 1.5, beta: float = 0.0) -> np.ndarray:
    return cv2.convertScaleAbs(gray, alpha=alpha, beta=beta)


def gamma_transform(gray: np.ndarray, gamma: float = 0.5) -> np.ndarray:
    lut = np.clip(((np.arange(256) / 255.0) ** gamma) * 255.0, 0, 255).astype(np.uint8)
    return cv2.LUT(gray.astype(np.uint8), lut)


def laplacian_sharpen(gray: np.ndarray) -> np.ndarray:
    lap = cv2.Laplacian(gray, cv2.CV_16S, ksize=3)
    return cv2.convertScaleAbs(gray.astype(np.int16) - lap)


def gaussian_subtract(gray: np.ndarray, ksize: int = 5, weight: float = 1.0) -> np.ndarray:
    blur = cv2.GaussianBlur(gray, (ksize, ksize), 0)
    return cv2.convertScaleAbs(gray.astype(np.float32) + weight * (gray.astype(np.float32) - blur.astype(np.float32)))


ENHANCEMENTS = {
    "eq": hist_equalize,
    "ahe": adaptive_hist_equalize,
    "lt": linear_transform,
    "gamma": gamma_transform,
    "laplace": laplacian_sharpen,
    "gaussian": gaussian_subtract,
}


def enhance_all(gray: np.ndarray) -> dict[str, np.ndarray]:
    return {name: fn(gray) for name, fn in ENHANCEMENTS.items()}
