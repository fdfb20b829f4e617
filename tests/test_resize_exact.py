"""Bit-exact parity of the device resize twins (ops/resize_exact.py) with the
host libraries they mirror: PIL BILINEAR (process_image's resampler) and cv2
INTER_LINEAR (the reference dataloader's gray-depth/mask resizer). These are
what let the raw-uint8 device-preprocess path accept arbitrary camera sizes
(VERDICT r4 #8)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image

from rgbdseg_tpu.ops.resize_exact import cv2_resize_linear_u8, pil_resize_u8

SIZES = [
    (720, 1280, 480, 640),  # camera downscale (the predict_example case)
    (100, 90, 64, 64),
    (50, 60, 128, 96),  # upscale
    (33, 47, 64, 80),
    (640, 480, 97, 131),  # heavy downscale (stresses coefficient rounding)
    (480, 640, 480, 640),  # identity
    (7, 5, 64, 64),
    (96, 128, 480, 640),
    (301, 399, 203, 111),
]


@pytest.mark.parametrize("ih,iw,oh,ow", SIZES)
def test_pil_bilinear_exact(ih, iw, oh, ow):
    rs = np.random.RandomState(ih * 1000 + ow)
    for shape in [(ih, iw), (ih, iw, 3)]:
        img = rs.randint(0, 256, shape, np.uint8)
        want = np.asarray(Image.fromarray(img).resize((ow, oh), Image.BILINEAR))
        got = np.asarray(pil_resize_u8(img, (oh, ow)))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ih,iw,oh,ow", SIZES)
def test_cv2_linear_exact(ih, iw, oh, ow):
    rs = np.random.RandomState(ih * 1000 + ow + 7)
    for shape in [(ih, iw), (ih, iw, 3)]:
        img = rs.randint(0, 256, shape, np.uint8)
        want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
        got = np.asarray(cv2_resize_linear_u8(img, (oh, ow)))
        np.testing.assert_array_equal(got, want)


def test_batched_matches_per_image():
    rs = np.random.RandomState(3)
    imgs = rs.randint(0, 256, (4, 72, 56, 3), np.uint8)
    bp = np.asarray(pil_resize_u8(imgs, (48, 64)))
    bc = np.asarray(cv2_resize_linear_u8(imgs, (48, 64)))
    for i in range(4):
        np.testing.assert_array_equal(bp[i], np.asarray(pil_resize_u8(imgs[i], (48, 64))))
        np.testing.assert_array_equal(bc[i], np.asarray(cv2_resize_linear_u8(imgs[i], (48, 64))))


def test_jit_compatible():
    import jax

    img = np.random.RandomState(0).randint(0, 256, (2, 40, 30, 3), np.uint8)
    f = jax.jit(lambda x: (pil_resize_u8(x, (64, 48)), cv2_resize_linear_u8(x, (64, 48))))
    a, b = f(img)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(pil_resize_u8(img, (64, 48))))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(cv2_resize_linear_u8(img, (64, 48))))
