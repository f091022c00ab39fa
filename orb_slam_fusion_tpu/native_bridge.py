"""ctypes bridge to the native host-runtime library.

Loads native/lib/libosf_native.so (building it on first use if the
toolchain is present) and exposes the C routines with numpy signatures.
Every entry point has a pure-Python fallback so the package works without
a compiler; the native paths are drop-in accelerations of host-side
bottlenecks (see native/src/osf_native.cc).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_root(), "native", "lib", "libosf_native.so")
    if not os.path.exists(so):
        build = os.path.join(_root(), "native", "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True,
                           timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    lib.osf_build_landmark_groups.restype = ctypes.c_int32
    lib.osf_build_landmark_groups.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
    lib.osf_covisibility.restype = None
    lib.osf_covisibility.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p]
    lib.osf_parse_euroc_imu.restype = ctypes.c_int64
    lib.osf_parse_euroc_imu.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64]
    lib.osf_parse_euroc_cam.restype = ctypes.c_int64
    lib.osf_parse_euroc_cam.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ctypes.c_int64]
    lib.osf_associate.restype = None
    lib.osf_associate.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_double, ctypes.c_void_p]
    try:
        lib.osf_parse_dbow2_text.restype = ctypes.c_int64
        lib.osf_parse_dbow2_text.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
    except AttributeError:
        pass  # stale library build without the vocab parser
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def build_landmark_groups(mp_idx: np.ndarray, valid: np.ndarray,
                          num_points: int, max_obs: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Native landmark->factor grouping; numpy fallback if unavailable."""
    lib = _load()
    mp_idx = np.ascontiguousarray(mp_idx, np.int32)
    valid_u8 = np.ascontiguousarray(valid, np.uint8)
    if lib is not None:
        out_idx = np.zeros((num_points, max_obs), np.int32)
        out_mask = np.zeros((num_points, max_obs), np.uint8)
        lib.osf_build_landmark_groups(
            mp_idx.ctypes.data, valid_u8.ctypes.data,
            np.int64(len(mp_idx)), np.int32(num_points), np.int32(max_obs),
            out_idx.ctypes.data, out_mask.ctypes.data)
        return out_idx, out_mask.astype(bool)
    # fallback: the original python loop
    idx = np.zeros((num_points, max_obs), np.int32)
    mask = np.zeros((num_points, max_obs), bool)
    cursor = np.zeros(num_points, np.int64)
    for f in np.nonzero(valid)[0]:
        l = mp_idx[f]
        c = cursor[l]
        if c < max_obs:
            idx[l, c] = f
            mask[l, c] = True
            cursor[l] = c + 1
    return idx, mask


def parse_euroc_imu(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (t (N,) seconds float64, gyro (N,3), acc (N,3))."""
    lib = _load()
    if lib is not None:
        n = lib.osf_parse_euroc_imu(path.encode(), None, None, None, 0)
        if n < 0:
            raise FileNotFoundError(path)
        t = np.zeros(n, np.float64)
        gyro = np.zeros((n, 3), np.float32)
        acc = np.zeros((n, 3), np.float32)
        lib.osf_parse_euroc_imu(path.encode(), t.ctypes.data,
                                gyro.ctypes.data, acc.ctypes.data, n)
        return t, gyro, acc
    rows = np.loadtxt(path, delimiter=",", comments="#")
    return (rows[:, 0] * 1e-9, rows[:, 1:4].astype(np.float32),
            rows[:, 4:7].astype(np.float32))


def parse_euroc_cam(path: str) -> Tuple[np.ndarray, list]:
    """Returns (t (N,) seconds, filenames list)."""
    lib = _load()
    stride = 256
    if lib is not None:
        n = lib.osf_parse_euroc_cam(path.encode(), None, None, stride, 0)
        if n < 0:
            raise FileNotFoundError(path)
        t = np.zeros(n, np.float64)
        names = np.zeros((n, stride), np.uint8)
        lib.osf_parse_euroc_cam(path.encode(), t.ctypes.data,
                                names.ctypes.data, stride, n)
        out = [bytes(names[i]).split(b"\0")[0].decode() for i in range(n)]
        return t, out
    t_list, names = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            ts, name = line.strip().split(",")[:2]
            t_list.append(float(ts) * 1e-9)
            names.append(name)
    return np.asarray(t_list), names


def associate(query_t: np.ndarray, ref_t: np.ndarray,
              max_dt: float = 0.02) -> np.ndarray:
    """Nearest-timestamp association (sorted inputs); -1 where unmatched."""
    lib = _load()
    query_t = np.ascontiguousarray(query_t, np.float64)
    ref_t = np.ascontiguousarray(ref_t, np.float64)
    if lib is not None:
        out = np.zeros(len(query_t), np.int64)
        lib.osf_associate(query_t.ctypes.data, np.int64(len(query_t)),
                          ref_t.ctypes.data, np.int64(len(ref_t)),
                          np.float64(max_dt), out.ctypes.data)
        return out
    out = np.full(len(query_t), -1, np.int64)
    for i, q in enumerate(query_t):
        j = np.searchsorted(ref_t, q)
        best, bd = -1, max_dt
        for jj in (j - 1, j):
            if 0 <= jj < len(ref_t) and abs(ref_t[jj] - q) <= bd:
                best, bd = jj, abs(ref_t[jj] - q)
        out[i] = best
    return out


def parse_dbow2_text(path: str):
    """Native DBoW2 text-vocabulary parse.

    Returns (k, levels, parents (N,) i32, is_leaf (N,) u8,
    descs (N,8) u32, weights (N,) f32) or None if the native library is
    unavailable (callers fall back to numpy parsing).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "osf_parse_dbow2_text"):
        return None
    header = np.zeros(4, np.int32)
    n = lib.osf_parse_dbow2_text(path.encode(), header.ctypes.data,
                                 None, None, None, None, 0)
    if n < 0:
        raise FileNotFoundError(path)
    parents = np.zeros(n, np.int32)
    is_leaf = np.zeros(n, np.uint8)
    descs = np.zeros((n, 32), np.uint8)
    weights = np.zeros(n, np.float32)
    lib.osf_parse_dbow2_text(path.encode(), header.ctypes.data,
                             parents.ctypes.data, is_leaf.ctypes.data,
                             descs.ctypes.data, weights.ctypes.data, n)
    return (int(header[0]), int(header[1]), parents, is_leaf,
            np.ascontiguousarray(descs).view(np.uint32), weights)


def covisibility(obs: np.ndarray, num_points: int) -> np.ndarray:
    """(K,F) observation rows -> (K,K) shared-point counts (native)."""
    lib = _load()
    obs = np.ascontiguousarray(obs, np.int32)
    K, F = obs.shape
    if lib is not None:
        W = np.zeros((K, K), np.int32)
        lib.osf_covisibility(obs.ctypes.data, np.int32(K), np.int32(F),
                             np.int32(num_points), W.ctypes.data)
        return W
    memb = np.zeros((K, num_points), bool)
    rows = np.repeat(np.arange(K), F)
    flat = obs.reshape(-1)
    ok = flat >= 0
    memb[rows[ok], flat[ok]] = True
    W = (memb.astype(np.int32) @ memb.astype(np.int32).T)
    np.fill_diagonal(W, 0)
    return W
