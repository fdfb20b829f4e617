"""Intel RealSense capture utilities (host-only; gated on pyrealsense2)."""
