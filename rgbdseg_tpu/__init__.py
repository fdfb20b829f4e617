"""rgbdseg_tpu — TPU-native RGB-D instance segmentation framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
TheoBald200814/RGB-D-Instance-Segmentation (reference mounted at /root/reference):
a Mask2Former-style model (Swin-T backbone, multi-scale deformable-attention pixel
decoder, masked-attention transformer decoder, Hungarian-matched dice/BCE point
losses) extended with depth-guided fusion modules (DGGM, DSAM, E-DSAM), a versioned
channel-layout registry binding data pipelines to fusion architectures, a training/
eval harness, and inference/export tooling.

Layout convention: NHWC (channels-last) everywhere on device. The reference uses
NCHW (PyTorch); we use NHWC because XLA:TPU tiles the trailing dimension onto the
128-lane vector registers and convolutions natively prefer feature-minor layouts.
"""

__version__ = "0.1.0"
