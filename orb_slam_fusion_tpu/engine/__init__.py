"""SLAM engine: tracking, local mapping, keyframe management.

Replaces the reference's three pthread loops (src/tracking.cc,
src/localmapping.cc, src/loopclosing.cc). The data-dependent state machine
(initialize / track / insert keyframe / lost) stays on the host exactly as
SURVEY.md prescribes; every compute step inside a state is a jitted
static-shape program over the SoA map tables. Queues and mutexes disappear:
the host sequences functional map updates (tracking result -> keyframe
insert -> local BA) and can later overlap them on device streams.
"""

from .config import SlamConfig  # noqa: F401
from .tracker import MonoTracker, TrackState  # noqa: F401
