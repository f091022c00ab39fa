"""Map / session checkpointing.

Replaces the reference's boost-archive atlas serialization
(System::SaveAtlas/LoadAtlas, src/system.cc:1391-1527, plus the Pre/Post
pointer-rebuild hooks in atlas.cc/map.cc): because the map is already flat
SoA arrays, a checkpoint is a single compressed .npz of the pytree leaves —
no pointer graph to rebuild. The reference's MD5 vocabulary checksum guard
(system.cc:1417) maps to a hash of the vocabulary codebook stored alongside.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .. import lie
from ..map.map_state import MapState

FORMAT_VERSION = 2
# fields added after v1 checkpoints, loaded with defaults when absent
_V2_DEFAULTS = {
    "mp_min_dist": lambda M: np.zeros(M, np.float32),
    "mp_max_dist": lambda M: np.full(M, 1e9, np.float32),
}


def vocab_checksum(words: jnp.ndarray) -> str:
    return hashlib.md5(np.asarray(words).tobytes()).hexdigest()


def map_to_arrays(m: MapState, prefix: str = "") -> dict:
    """Flatten a MapState into named numpy arrays (pose split into R/t)."""
    d = {prefix + "kf_pose_R": np.asarray(m.kf_pose.R),
         prefix + "kf_pose_t": np.asarray(m.kf_pose.t)}
    for name in MapState._fields:
        if name == "kf_pose":
            continue
        d[prefix + name] = np.asarray(getattr(m, name))
    return d


def map_from_arrays(get, prefix: str = "") -> MapState:
    """Rebuild a MapState from a name->array accessor (`get(name)` returns
    the array or None for fields absent in older checkpoints)."""
    kwargs = {}
    max_mp = get(prefix + "mp_valid").shape[0]
    for name in MapState._fields:
        if name == "kf_pose":
            continue
        arr = get(prefix + name)
        if arr is None and name in _V2_DEFAULTS:
            arr = _V2_DEFAULTS[name](max_mp)
        kwargs[name] = jnp.asarray(arr)
    kwargs["kf_pose"] = lie.SE3(jnp.asarray(get(prefix + "kf_pose_R")),
                                jnp.asarray(get(prefix + "kf_pose_t")))
    return MapState(**kwargs)


def save_map(path: str, m: MapState,
             vocab_words: Optional[jnp.ndarray] = None,
             **extra_arrays) -> None:
    """Write a map checkpoint (plus optional extra arrays, e.g. kf_uright,
    velocities/biases for inertial sessions, archived atlas maps)."""
    payload = {"format_version": np.int64(FORMAT_VERSION)}
    payload.update(map_to_arrays(m))
    if vocab_words is not None:
        payload["vocab_md5"] = np.frombuffer(
            vocab_checksum(vocab_words).encode(), dtype=np.uint8)
    for k, v in extra_arrays.items():
        payload["extra_" + k] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_map(path: str,
             vocab_words: Optional[jnp.ndarray] = None
             ) -> Tuple[MapState, dict]:
    """Read a checkpoint; verifies the vocabulary checksum if provided
    (reference behavior: refuse to load an atlas built with a different
    vocabulary, system.cc:1477)."""
    z = np.load(path, allow_pickle=False)
    ver = int(z["format_version"])
    if ver > FORMAT_VERSION or ver < 1:
        raise ValueError(f"checkpoint format {ver} != {FORMAT_VERSION}")
    if vocab_words is not None and "vocab_md5" in z:
        stored = bytes(z["vocab_md5"]).decode()
        if stored != vocab_checksum(vocab_words):
            raise ValueError(
                "vocabulary checksum mismatch — this map was built with a "
                "different vocabulary")
    m = map_from_arrays(lambda n: z[n] if n in z.files else None)
    extras = {k[6:]: jnp.asarray(z[k]) for k in z.files
              if k.startswith("extra_")}
    return m, extras
