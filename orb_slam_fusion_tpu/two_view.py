"""Two-view relative-pose initialization via batched RANSAC.

Replaces TwoViewReconstruction (src/cam/two_view_reconstruction.cc): the
reference runs 200 RANSAC iterations for a homography and a fundamental
matrix in two parallel threads, then picks by score ratio. The TPU-native
formulation evaluates ALL hypotheses simultaneously as a batch axis:

* minimal sets are drawn with a Gumbel-top-k trick (no rejection loops);
* the 8-point systems are solved as one batched SVD;
* per-hypothesis scoring is a dense (hypotheses x correspondences) Sampson
  error matrix — pure VPU work;
* motion recovery checks all 4 (R, t) decompositions of the winner with
  batched cheirality tests (reference: ReconstructF/CheckRT).

A batched 4-point homography path is provided as well, with the reference's
H-vs-F model selection by score ratio (two_view_reconstruction.cc:
ratio SH/(SH+SF) > 0.5 picks H) so near-planar and pure-rotation scenes
initialize correctly.

Inputs are unit-plane rays (z=1 normalized camera coords), so the module is
camera-model agnostic — pinhole and fisheye both unproject to rays first.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from . import cameras, lie


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # () bool — initialization succeeded
    R21: jnp.ndarray         # (3,3) rotation frame1 -> frame2
    t21: jnp.ndarray         # (3,) unit-norm translation
    points1: jnp.ndarray     # (N,3) triangulated points in frame-1 coords
    inliers: jnp.ndarray     # (N,) bool
    n_inliers: jnp.ndarray   # () int32
    used_homography: jnp.ndarray  # () bool


def _sample_minimal_sets(key, valid: jnp.ndarray, n_hyp: int, k: int
                         ) -> jnp.ndarray:
    """(n_hyp, k) indices of valid correspondences (Gumbel top-k)."""
    n = valid.shape[0]
    g = jax.random.gumbel(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _eight_point(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point essential estimate.

    r1, r2: (H, 8, 3) unit-plane rays. Returns (H, 3, 3) essential matrices
    satisfying r2^T E r1 = 0, projected onto the essential manifold.
    """
    x1, y1 = r1[..., 0], r1[..., 1]
    x2, y2 = r2[..., 0], r2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # (H, 8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    e = vt[..., -1, :]                       # (H, 9)
    E = e.reshape(e.shape[:-1] + (3, 3))
    # project to essential manifold: singular values -> (s, s, 0)
    u, s, vt2 = jnp.linalg.svd(E)
    s_mean = 0.5 * (s[..., 0] + s[..., 1])
    s_fix = jnp.stack([s_mean, s_mean, jnp.zeros_like(s_mean)], axis=-1)
    return u @ (s_fix[..., None] * vt2)


def _sampson_error(E: jnp.ndarray, r1: jnp.ndarray, r2: jnp.ndarray
                   ) -> jnp.ndarray:
    """Sampson distance per (hypothesis, correspondence): (H, N)."""
    Ex1 = jnp.einsum("hij,nj->hni", E, r1)       # (H,N,3)
    Etx2 = jnp.einsum("hji,nj->hni", E, r2)      # (H,N,3)
    num = jnp.einsum("ni,hni->hn", r2, Ex1) ** 2
    den = (Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2
           + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2)
    return num / jnp.maximum(den, 1e-12)


def _decompose_essential(E: jnp.ndarray):
    """4 candidate (R, t) pairs from one essential matrix."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    du = jnp.linalg.det(u)
    dv = jnp.linalg.det(vt)
    u = u * jnp.stack([jnp.ones_like(du), jnp.ones_like(du), du])[None, :]
    vt = vt * jnp.stack([jnp.ones_like(dv), jnp.ones_like(dv), dv])[:, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  dtype=E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _check_rt(R: jnp.ndarray, t: jnp.ndarray, r1: jnp.ndarray,
              r2: jnp.ndarray, mask: jnp.ndarray,
              min_parallax_cos: float = 0.99995):
    """Cheirality + parallax scoring of one (R, t): reference CheckRT
    (two_view_reconstruction.cc). Returns (score, points, good_mask)."""
    X = cameras.triangulate(r1, r2, R, t)          # frame-1 coords
    X2 = jnp.einsum("ij,nj->ni", R, X) + t
    z1 = X[..., 2]
    z2 = X2[..., 2]
    # parallax: angle between viewing rays
    c1 = X
    c2 = X - (-jnp.einsum("ji,j->i", R, t))        # X - C2 (C2 in frame1)
    cosp = jnp.sum(c1 * c2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(c1, axis=-1) * jnp.linalg.norm(c2, axis=-1), 1e-12)
    good = mask & (z1 > 0) & (z2 > 0) & (cosp < min_parallax_cos)
    # reprojection sanity in normalized plane
    e1 = jnp.sum((X[..., :2] / jnp.maximum(z1[..., None], 1e-9)
                  - r1[..., :2]) ** 2, axis=-1)
    e2 = jnp.sum((X2[..., :2] / jnp.maximum(z2[..., None], 1e-9)
                  - r2[..., :2]) ** 2, axis=-1)
    th = (4.0 / 460.0) ** 2  # ~4px at EuRoC-ish focal length
    good = good & (e1 < th) & (e2 < th)
    n_good = jnp.sum(good.astype(jnp.int32))
    # representative parallax (reference CheckRT: sort the good points'
    # parallax cosines ascending and take the 50th — a robust "the map
    # has REAL parallax" statistic, not the single best point)
    cos_sorted = jnp.sort(jnp.where(good, cosp, 1.0))
    rep_idx = jnp.clip(jnp.minimum(50, n_good - 1), 0, cosp.shape[0] - 1)
    rep_cos = cos_sorted[rep_idx]
    return n_good, X, good, rep_cos


# ---------------------------------------------------------------------------
# Homography path
# ---------------------------------------------------------------------------


def _four_point_h(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """Batched 4-point DLT homography: (H,4,3) rays -> (H,3,3)."""
    x1, y1 = r1[..., 0], r1[..., 1]
    x2, y2 = r2[..., 0], r2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    rows_a = jnp.stack(
        [x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    rows_b = jnp.stack(
        [z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], axis=-1)
    A = jnp.concatenate([rows_a, rows_b], axis=-2)  # (H, 8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., -1, :]
    return h.reshape(h.shape[:-1] + (3, 3))


def _decompose_homography(Hm: jnp.ndarray):
    """Faugeras' 8-motion decomposition of a homography.

    Reference: TwoViewReconstruction::ReconstructH
    (src/cam/two_view_reconstruction.cc) implements the same SVD-based
    Faugeras-Lustman solutions; here all 8 are produced as a batch and the
    caller's cheirality check picks the winner. Returns (Rs (8,3,3),
    ts (8,3) unit-normalized).
    """
    U, d, Vt = jnp.linalg.svd(Hm)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / denom, 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / denom, 0.0))

    Rs, ts = [], []
    d2s = jnp.maximum(d2, 1e-12)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # case d' = d2
            sin_t = (d1 - d3) * (e1 * x1) * (e3 * x3) / d2s
            cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2s
            Rp = jnp.array([[1.0, 0.0, 0.0],
                            [0.0, 1.0, 0.0],
                            [0.0, 0.0, 1.0]], dtype=Hm.dtype)
            Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-sin_t)
            Rp = Rp.at[2, 0].set(sin_t).at[2, 2].set(cos_t)
            tp = (d1 - d3) * jnp.stack(
                [e1 * x1, jnp.zeros_like(x1), -e3 * x3])
            Rs.append(s * U @ Rp @ Vt)
            ts.append(U @ tp)
            # case d' = -d2
            sin_p = (d1 + d3) * (e1 * x1) * (e3 * x3) / d2s
            cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / d2s
            Rn = jnp.zeros((3, 3), dtype=Hm.dtype)
            Rn = Rn.at[0, 0].set(cos_p).at[0, 2].set(sin_p)
            Rn = Rn.at[1, 1].set(-1.0)
            Rn = Rn.at[2, 0].set(sin_p).at[2, 2].set(-cos_p)
            tn = (d1 + d3) * jnp.stack(
                [e1 * x1, jnp.zeros_like(x1), e3 * x3])
            Rs.append(s * U @ Rn @ Vt)
            ts.append(U @ tn)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


def _h_transfer_error(Hm: jnp.ndarray, r1: jnp.ndarray, r2: jnp.ndarray
                      ) -> jnp.ndarray:
    """Symmetric transfer error (H, N) for homography hypotheses."""
    def xfer(H, a, b):
        p = jnp.einsum("hij,nj->hni", H, a)
        p = p[..., :2] / jnp.where(
            jnp.abs(p[..., 2:3]) < 1e-12, 1e-12, p[..., 2:3])
        return jnp.sum((p - b[None, :, :2]) ** 2, axis=-1)

    Hinv = jnp.linalg.inv(Hm)
    return xfer(Hm, r1, r2) + xfer(Hinv, r2, r1)


@functools.partial(jax.jit, static_argnames=("n_hyp", "px_threshold_focal"))
def two_view_init(
    rays1: jnp.ndarray,   # (N,3) z=1 rays in frame 1
    rays2: jnp.ndarray,   # (N,3) z=1 rays in frame 2 (same correspondence row)
    valid: jnp.ndarray,   # (N,) bool
    key: jnp.ndarray,
    n_hyp: int = 256,
    px_threshold_focal: float = 460.0,
    min_inliers: int = 50,
) -> TwoViewResult:
    """Full two-view reconstruction: E and H RANSAC + model select + recovery.

    Model selection follows the reference (two_view_reconstruction.cc
    Reconstruct): if the homography score dominates, recover from H (planar /
    low-parallax); otherwise from E. Returns geometry in frame-1 coordinates
    with unit baseline scale.
    """
    kE, kH = jax.random.split(key)
    thresh = (1.5 / px_threshold_focal) ** 2  # ~1.5px in normalized coords

    # ---------------- essential hypotheses --------------------------------
    idxE = _sample_minimal_sets(kE, valid, n_hyp, 8)
    E = _eight_point(rays1[idxE], rays2[idxE])
    errE = _sampson_error(E, rays1, rays2)                   # (H,N)
    inlE = (errE < thresh) & valid[None, :]
    scoreE = jnp.sum(inlE.astype(jnp.int32), axis=1)
    bestE = jnp.argmax(scoreE)
    E_best = E[bestE]
    inliersE = inlE[bestE]

    # ---------------- homography hypotheses -------------------------------
    idxH = _sample_minimal_sets(kH, valid, n_hyp, 4)
    Hm = _four_point_h(rays1[idxH], rays2[idxH])
    errH = _h_transfer_error(Hm, rays1, rays2)
    inlH = (errH < 2.0 * thresh) & valid[None, :]  # symmetric error ~ 2x
    scoreH = jnp.sum(inlH.astype(jnp.int32), axis=1)
    bestH = jnp.argmax(scoreH)
    inliersH = inlH[bestH]

    # Reference model selection (two_view_reconstruction.cc Reconstruct):
    # ratio = SH/(SH+SF) > 0.50 picks the homography — i.e. H wins at
    # parity, because E is degenerate exactly when H explains the scene.
    use_h = scoreH[bestH].astype(jnp.float32) >= 0.95 * scoreE[bestE].astype(
        jnp.float32)

    # ---------------- motion recovery from E ------------------------------
    Rs, ts = _decompose_essential(E_best)
    scores, Xs, goods, rcos = jax.vmap(
        lambda R, t: _check_rt(R, t, rays1, rays2, inliersE))(Rs, ts)
    k_best = jnp.argmax(scores)
    R_e, t_e = Rs[k_best], ts[k_best]
    X_e, good_e, n_e = Xs[k_best], goods[k_best], scores[k_best]
    rcos_e = rcos[k_best]
    # winner must clearly beat runner-up (reference: unique solution check)
    sorted_scores = jnp.sort(scores)
    distinct = sorted_scores[-1] > jnp.maximum(
        (0.9 * sorted_scores[-1]).astype(jnp.int32), sorted_scores[-2])

    # ---------------- motion recovery from H (Faugeras, 8 hypotheses) -----
    # Refit H on its inliers (DLT over up to 32 best) for stability, then
    # check all 8 Faugeras decompositions with the same cheirality test.
    idx_h32 = _sample_minimal_sets(jax.random.fold_in(kH, 1),
                                   inliersH, 1, 32)[0]
    H_refit = _four_point_h(rays1[idx_h32][None, :], rays2[idx_h32][None, :])[0]
    Rs_h, ts_h = _decompose_homography(H_refit)
    scores_h, Xs_h, goods_h, rcos_h = jax.vmap(
        lambda R, t: _check_rt(R, t, rays1, rays2, inliersH))(Rs_h, ts_h)
    kh = jnp.argmax(scores_h)

    R21 = jnp.where(use_h, Rs_h[kh], R_e)
    t21 = jnp.where(use_h, ts_h[kh], t_e)
    X = jnp.where(use_h, Xs_h[kh], X_e)
    good = jnp.where(use_h, goods_h[kh], good_e)
    n_good = jnp.where(use_h, scores_h[kh], n_e)
    rep_cos = jnp.where(use_h, rcos_h[kh], rcos_e)

    tnorm = jnp.linalg.norm(t21)
    t21 = t21 / jnp.maximum(tnorm, 1e-12)
    X = X / jnp.maximum(tnorm, 1e-12)

    # minimum representative parallax (reference Reconstruct: minParallax
    # = 1 deg for both ReconstructF and ReconstructH) — accepting a
    # near-zero-baseline init produces a map whose depths are noise; the
    # session then tracks it for a while and collapses
    enough_parallax = rep_cos < 0.99984769515  # cos(1 deg)
    ok = (n_good >= min_inliers) & (distinct | use_h) & (tnorm > 1e-6) \
        & enough_parallax
    return TwoViewResult(ok=ok, R21=R21, t21=t21, points1=X,
                         inliers=good, n_inliers=n_good,
                         used_homography=use_h)
