"""Visualization: map / trajectory / frame rendering.

Replaces the reference's Pangolin GL viewer stack (src/viewer.cc,
src/utils/{map_drawer,frame_drawer}.cc) with headless matplotlib rendering:
no interactive window exists in TPU pods, so "viewing" means writing PNGs
(or an HTML animation) the operator opens out-of-band — the drawing content
matches the reference (map points, keyframe frusta, covisibility edges,
current camera, per-frame keypoint overlay).
"""

from .drawers import draw_map, draw_frame, MapDrawer, FrameDrawer  # noqa: F401
