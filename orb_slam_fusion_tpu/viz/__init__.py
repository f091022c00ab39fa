"""Visualization: map / trajectory / frame rendering + interactive viewer.

Replaces the reference's Pangolin GL viewer stack (src/viewer.cc,
src/utils/{map_drawer,frame_drawer}.cc) two ways: headless matplotlib
PNG rendering (drawers.py — map points, keyframe frusta, covisibility
edges, current camera, per-frame keypoint overlay), and a self-contained
interactive HTML viewer (viewer.py — orbit/zoom/pan, play/step/pause,
follow-camera and show-points/keyframes/graph toggles mirroring the
reference viewer menu, src/viewer.cc:156-188) that runs offline from a
single file; no interactive window exists in TPU pods, so the live GL
loop becomes an exported artifact with the same interaction surface.
"""

from .drawers import draw_map, draw_frame, MapDrawer, FrameDrawer  # noqa: F401
from .viewer import export_interactive  # noqa: F401
