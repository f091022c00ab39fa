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

FORMAT_VERSION = 1


def vocab_checksum(words: jnp.ndarray) -> str:
    return hashlib.md5(np.asarray(words).tobytes()).hexdigest()


def save_map(path: str, m: MapState,
             vocab_words: Optional[jnp.ndarray] = None,
             **extra_arrays) -> None:
    """Write a map checkpoint (plus optional extra arrays, e.g. kf_uright,
    velocities/biases for inertial sessions)."""
    payload = {
        "format_version": np.int64(FORMAT_VERSION),
        "kf_pose_R": np.asarray(m.kf_pose.R),
        "kf_pose_t": np.asarray(m.kf_pose.t),
    }
    for name in MapState._fields:
        if name == "kf_pose":
            continue
        payload[name] = np.asarray(getattr(m, name))
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
    if ver != FORMAT_VERSION:
        raise ValueError(f"checkpoint format {ver} != {FORMAT_VERSION}")
    if vocab_words is not None and "vocab_md5" in z:
        stored = bytes(z["vocab_md5"]).decode()
        if stored != vocab_checksum(vocab_words):
            raise ValueError(
                "vocabulary checksum mismatch — this map was built with a "
                "different vocabulary")
    kwargs = {}
    for name in MapState._fields:
        if name == "kf_pose":
            kwargs[name] = None
            continue
        kwargs[name] = jnp.asarray(z[name])
    kwargs["kf_pose"] = lie.SE3(jnp.asarray(z["kf_pose_R"]),
                                jnp.asarray(z["kf_pose_t"]))
    extras = {k[6:]: jnp.asarray(z[k]) for k in z.files
              if k.startswith("extra_")}
    return MapState(**kwargs), extras
