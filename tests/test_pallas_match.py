"""Parity test: Pallas streaming matcher vs the dense XLA matcher."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_fusion_tpu.frontend import matcher
from orb_slam_fusion_tpu.frontend.pallas_match import (
    search_by_projection_pallas)


def test_parity_with_dense():
    rng = np.random.RandomState(0)
    M, N = 700, 256
    pred_uv = jnp.asarray(rng.uniform(0, 470, (M, 2)), jnp.float32)
    kp_uv = jnp.asarray(rng.uniform(0, 470, (N, 2)), jnp.float32)
    mp_desc = jnp.asarray(rng.randint(0, 2 ** 32, (M, 8),
                                      dtype=np.uint64).astype(np.uint32))
    # make some keypoints exact matches of some map points, placed nearby
    match_rows = rng.choice(M, 100, replace=False)
    match_cols = rng.choice(N, 100, replace=False)
    mp_desc_np = np.asarray(mp_desc)
    kp_desc_np = np.asarray(
        rng.randint(0, 2 ** 32, (N, 8), dtype=np.uint64).astype(np.uint32))
    kp_desc_np[match_cols] = mp_desc_np[match_rows]
    kp_uv_np = np.asarray(kp_uv).copy()
    kp_uv_np[match_cols] = np.asarray(pred_uv)[match_rows] + \
        rng.randn(100, 2) * 2
    kp_desc = jnp.asarray(kp_desc_np)
    kp_uv = jnp.asarray(kp_uv_np)
    mp_valid = jnp.asarray(rng.rand(M) > 0.1)
    kp_valid = jnp.asarray(rng.rand(N) > 0.1)

    idx_d, ok_d = matcher.search_by_projection(
        pred_uv, mp_desc, mp_valid, jnp.zeros(M, jnp.int32),
        kp_uv, kp_desc, kp_valid, jnp.zeros(N, jnp.int32),
        radius=15.0, max_dist=matcher.TH_HIGH, octave_window=16)
    idx_p, ok_p = search_by_projection_pallas(
        pred_uv, mp_desc, mp_valid, kp_uv, kp_desc, kp_valid,
        radius=15.0, max_dist=matcher.TH_HIGH, interpret=True)

    np.testing.assert_array_equal(np.asarray(ok_d), np.asarray(ok_p))
    np.testing.assert_array_equal(np.asarray(idx_d), np.asarray(idx_p))
