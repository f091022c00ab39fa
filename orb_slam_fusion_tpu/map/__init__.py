"""Map data model: device-resident struct-of-arrays tables.

Replaces the reference's pointer-graph map layer (src/map/{frame,keyframe,
mappoint,map,atlas}.cc + the per-map `mMutexMapUpdate` big lock) with
fixed-capacity SoA tensors and functional updates:

* keyframes and map points live in padded tables with validity masks;
* observations are a per-keyframe feature->map-point index table;
* the covisibility graph is one MXU matmul over the observation membership
  matrix instead of incremental weighted-edge bookkeeping;
* "locking" disappears: updates produce new table states, and the engine
  layer sequences them (epochs instead of mutexes).
"""

from .map_state import (  # noqa: F401
    MapState, make_empty_map, add_keyframe, add_map_points,
    covisibility_matrix, observation_triples,
)
