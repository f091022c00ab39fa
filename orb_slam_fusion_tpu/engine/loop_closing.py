"""Loop closing: detection, Sim3 verification, correction, pose graph.

Replaces the LoopClosing thread (src/loopclosing.cc) for the single-map
case: BoW candidate retrieval (KeyFrameDatabase), descriptor matching +
Sim3 RANSAC (Sim3Solver) + Sim3 LM verification (OptimizeSim3), then the
correction pipeline of CorrectLoop (loopclosing.cc:883): propagate the
corrected Sim3 through the covisibility neighborhood, re-map points, and
optimize the essential graph over Sim(3) to absorb accumulated (scale)
drift. Runs synchronously after keyframe insertion (the reference's thread
pipelining maps to host-sequenced device programs; async overlap is a later
optimization).

Thresholds follow the reference: candidates need >=20 BoW matches, Sim3
RANSAC needs >=15 inliers (nBoWInliers), refinement >=20
(loopclosing.cc:489-813 reduced to the monocular path).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import functools

from .. import lie
from ..frontend import matcher
from ..map import map_state as ms
from ..place import KeyFrameDatabase, make_vocabulary
from ..place.database import _query, compute_bow_vector
from ..solver.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..solver.sim3 import optimize_sim3, sim3_ransac


@functools.partial(jax.jit, static_argnames=("top_k", "levels"))
def _detect_candidates(m: ms.MapState, bow, present, vocab, kf_id,
                       guard_lo, top_k: int = 3, levels: int = 0):
    """Loop-candidate detection as ONE device program: covisibility
    exclusion + temporal guard + BoW scoring + top-k (reference:
    DetectNBestCandidates with the covisibility-group exclusion,
    keyframe_database.cc:579). Also returns each candidate's covisibility
    group mask (top_k, K) for the temporal-consistency check."""
    kf_c = jnp.clip(kf_id, 0, m.max_kf - 1)
    W = ms.covisibility_matrix(m)
    kfa = jnp.arange(m.max_kf)
    # exclusion = CONNECTED keyframes (reference: covisibility edges exist
    # at weight >= 15 shared points, keyframe.cc:483 UpdateConnections;
    # DetectNBestCandidates excludes only those). A round-3 W > 0
    # exclusion barred any keyframe sharing even ONE point — in a
    # room-scale stereo-inertial run (V102) where long tracks touch most
    # of the map, that structurally disabled detection: 0 candidates in
    # 243 queries at the round-3 verdict. (A 15 s time guard was tried
    # here to force detection onto genuine revisits — it made V101
    # camera-rate WORSE, 87 -> 184 cm: the short-range closures carry
    # little drift information themselves, but each one triggers a global
    # BA that keeps the whole visual map polished.)
    temporal = (kfa >= guard_lo) & (kfa <= kf_id)
    cov = W[kf_c]
    excl_cov = cov >= 15
    # saturation fallback: the reference's exclusion set
    # (GetConnectedKeyFrames) is bounded in practice by occlusion and
    # viewpoint — distant keyframes stop sharing observations. In an
    # occlusion-free synthetic world long tracks touch most of the map,
    # the >=15 rule excludes EVERYTHING, and detection is structurally
    # disabled (the round-3/4 elig_zero runs: 103/103 stereo-inertial
    # queries with zero eligible entries). When exclusion would leave
    # fewer than 8 eligible database rows, keep only the 30 strongest
    # covisible links excluded (the reference's essential-graph
    # neighborhood size, keyframe.cc GetBestCovisibilityKeyFrames) —
    # every later stage (temporal consistency, Sim3 RANSAC + opt, guided
    # projection) still gates geometric correctness.
    n_elig0 = jnp.sum(present & ~(excl_cov | temporal))
    cap = min(30, int(cov.shape[0]))
    kth = jax.lax.top_k(jnp.where(excl_cov & present, cov, -1), cap)[0][-1]
    excl_relaxed = excl_cov & (cov >= jnp.maximum(kth, 15))
    excl_cov = jnp.where(n_elig0 >= 8, excl_cov, excl_relaxed)
    exclude = excl_cov | temporal
    q = compute_bow_vector(vocab, m.kf_desc[kf_c], m.kf_feat_valid[kf_c],
                           levels)
    ids, scores = _query(bow, present, q, exclude, top_k)
    ids_c = jnp.clip(ids, 0, m.max_kf - 1)
    groups = (W[ids_c] > 0) | (jax.nn.one_hot(
        ids_c, m.max_kf, dtype=jnp.int32) > 0)
    groups = groups & (ids >= 0)[:, None]
    # gate observability: how many database entries even survived the
    # covisibility + temporal exclusion (0 => detection is structurally
    # disabled, not merely under-scoring)
    n_elig = jnp.sum(present & ~exclude)
    return ids, scores, groups, n_elig


def _make_vocabulary(cfg, vocab_words: int):
    """Vocabulary from config: a file-loaded DBoW2 tree when
    `vocab_path` is set (reference: System loads ORBvoc from disk,
    system.cc:129), else the seeded flat LSH codebook."""
    path = getattr(cfg, "vocab_path", "") or ""
    if path:
        from ..place.tree_vocabulary import load_tree_binary, load_tree_text
        if path.endswith(".txt"):
            return load_tree_text(path)
        return load_tree_binary(path)
    return make_vocabulary(vocab_words), 0


class ChunkedGBA:
    """Abortable, host-interleaved global bundle adjustment.

    The reference runs GlobalBundleAdjustemnt on a background thread with a
    cooperative abort flag (loopclosing.cc:1104-1105 spawn, mbStopGBA
    polled inside the g2o loop, RunGlobalBundleAdjustment correction
    propagation at loopclosing.cc:2117-2327). The TPU-native equivalent:
    the LM carry (poses, points, lam, cost) stays device-resident, and the
    tracker advances the solve by a fixed-size `lm_chunk` dispatch per
    tracked frame — no host sync, so tracking programs queue between GBA
    chunks and a new loop/merge/compaction can drop the whole solve without
    ever blocking a frame. On completion the result is merged into the
    LIVE map: snapshot rows adopt the optimized values; keyframes created
    during the solve are corrected through their relative pose to the
    newest snapshot keyframe, and new points through their reference
    keyframe (the spanning-tree correction propagation of
    loopclosing.cc:2162-2230)."""

    def __init__(self, tracker, cfg, iters_first: int = 3,
                 iters_second: int = 7, chunk: int = 2):
        from ..solver import ba as ba_mod
        from ..frontend import extractor
        m = tracker.map
        self.cfg = cfg
        self.cam_model = cfg.cam_model
        self.snap_n_kf = int(m.n_kf)
        self.snap_n_mp = int(m.n_mp)
        n_kf = self.snap_n_kf
        window = jnp.arange(m.max_kf, dtype=jnp.int32)
        window = jnp.where(window < n_kf, window, -1)
        kf_idx, mp_idx, uv, octv, valid = ms.observation_triples(m, window)
        inv_s2 = extractor.inv_scale_sigma2(cfg.orb)[
            jnp.clip(octv, 0, cfg.orb.num_levels - 1)]
        fixed = np.ones(m.max_kf, bool)
        fixed[1:n_kf] = False
        prob = ba_mod.make_problem(
            m.kf_pose, m.mp_pos, kf_idx, mp_idx, uv, inv_s2, valid,
            jnp.asarray(fixed), tracker.cam_params,
            fixed_point=~m.mp_valid, max_obs=16)
        # large-K snapshots solve the reduced camera system matrix-free
        # (PCG): the dense Schur path materializes (M, K, 6, 3)
        # intermediates — GBs at grown capacities (K=512, M=32k). The
        # factor layout here IS window-contiguous (observation_triples
        # over window=arange(max_kf)), which the PCG path requires.
        stride = m.n_feat if m.max_kf > 64 else 0
        self.lm = ba_mod.ChunkedLM(prob, self.cam_model, iters_first,
                                   iters_second, chunk, pose_stride=stride)

    @property
    def prob(self):
        return self.lm.prob

    @property
    def poses(self):
        return self.lm.poses

    @property
    def points(self):
        return self.lm.points

    @property
    def done(self) -> bool:
        return self.lm.done

    def step(self) -> bool:
        """Advance by one device chunk. Returns True when finished. No
        host<->device synchronization happens here."""
        return self.lm.step()


class LoopCloser:
    def __init__(self, cfg, max_kf: int, vocab_words: int = 4096,
                 fix_scale: bool = False):
        self.cfg = cfg
        vocab, levels = _make_vocabulary(cfg, vocab_words)
        self.db = KeyFrameDatabase(vocab, max_kf, levels)
        self.fix_scale = fix_scale
        self.last_loop_kf = -10 ** 9
        self.min_gap = 10           # KFs between loop closures
        self.min_kf = 12            # reference: map must have >=12 KFs
        self.num_closed = 0
        self.max_kf_for_gba = 200   # GBA size gate (reference skips the
        # full essential graph for maps >200 KFs, loopclosing.cc:1097)
        # temporal-consistency state (reference ConsistentGroup,
        # loopclosing.cc:303-391): candidate covisibility groups must recur
        # over >= loop_consistency_th consecutive keyframes
        self._cons_groups: list = []   # [(frozenset(kf rows), count)]
        self.consistency_th = getattr(cfg, "loop_consistency_th", 3)
        # projection-validation thresholds, scaled from the reference's
        # ~1000-feature budget to this config's
        nf = cfg.orb.n_features
        s = min(1.0, max(0.3, nf / 1000.0))
        self.proj_th = max(15, int(getattr(cfg, "loop_proj_matches", 50) * s))
        self.proj_ref_th = max(
            20, int(getattr(cfg, "loop_proj_matches_ref", 80) * s))
        # persisted loop edges (reference KeyFrame::mspLoopEdges,
        # keyframe.h:237-243): every accepted closure's relative Sim3 enters
        # all later essential-graph solves so repeated closures reinforce
        self.loop_edges: list = []   # [(i, j, lie.Sim3 rel i->j)]
        # in-flight chunked global BA (reference: background GBA thread)
        self.pending_gba: Optional[ChunkedGBA] = None
        # detection dispatched at the previous keyframe, resolved at the
        # next (one-deep pipeline; see try_close)
        self._pending_detect = None
        self.background_gba = bool(getattr(cfg, "background_gba", True))
        # gate-stage counters (observability: WHERE do closures die?)
        self.stats = {"queries": 0, "candidates": 0, "consistent": 0,
                      "desc_fail": 0, "ransac_fail": 0, "sim3_fail": 0,
                      "proj_fail": 0, "closed": 0}

    # -- database maintenance (called by the tracker on KF insert) ---------

    def add_keyframe(self, kf_id: int, desc, valid) -> None:
        self.db.add(kf_id, desc, valid)

    def on_kf_remap(self, old_to_new, order) -> None:
        """Follow a keyframe-table compaction: permute BoW rows and remap
        stored keyframe ids."""
        # a compaction moves rows out from under an in-flight GBA snapshot
        # — abort it (reference: mbStopGBA on map rewrite); a deferred
        # detection's candidate rows also moved — drop it
        self.pending_gba = None
        self._pending_detect = None
        self.db.permute(order)
        if self.last_loop_kf >= 0:
            n = int(old_to_new[self.last_loop_kf]) \
                if self.last_loop_kf < len(old_to_new) else -1
            self.last_loop_kf = n if n >= 0 else -10 ** 9
        self._cons_groups = [
            (frozenset(int(old_to_new[k]) for k in grp
                       if k < len(old_to_new) and old_to_new[k] >= 0), cnt)
            for grp, cnt in self._cons_groups]
        self._cons_groups = [(g, c) for g, c in self._cons_groups if g]
        edges = []
        for i, j, rel in self.loop_edges:
            if (i < len(old_to_new) and j < len(old_to_new)
                    and old_to_new[i] >= 0 and old_to_new[j] >= 0):
                edges.append((int(old_to_new[i]), int(old_to_new[j]), rel))
        self.loop_edges = edges

    def on_kf_grow(self, new_max_kf: int) -> None:
        self.db.grow(new_max_kf)

    # -- detection + closure ------------------------------------------------

    def try_close(self, tracker) -> bool:
        """Detect and (if verified) close a loop for the newest keyframe.

        Detection is PIPELINED one keyframe deep: this call first resolves
        the candidates dispatched at the PREVIOUS keyframe (their device
        program has long finished — the readback costs nothing), then
        dispatches detection for the current keyframe without reading it
        back. The keyframe frame therefore never blocks on the detection
        program (round-2 verdict next #8; reference: LoopClosing runs on
        its own thread one queue entry behind LocalMapping).

        Returns True if a loop was closed (map was rewritten).
        """
        fired = False
        pending = self._pending_detect
        self._pending_detect = None
        if pending is not None:
            fired = self._resolve_detection(tracker, *pending)

        m = tracker.map
        kf_id = tracker.last_kf_id
        n_kf = int(m.n_kf)
        if kf_id < 0 or n_kf < self.min_kf:
            return fired
        if kf_id - self.last_loop_kf < self.min_gap:
            return fired

        # fused detection: covisibility exclusion + temporal guard + BoW
        # scoring in one dispatch, resolved at the NEXT keyframe
        ids, scores, groups, n_elig = _detect_candidates(
            m, self.db.bow, self.db.present, self.db.vocab,
            jnp.int32(kf_id), jnp.int32(max(0, kf_id - 6)),
            levels=self.db.levels)
        self._pending_detect = (kf_id, ids, groups, scores, n_elig)
        return fired

    def _resolve_detection(self, tracker, kf_id: int, ids, groups,
                           scores=None, n_elig=None) -> bool:
        """Consume a deferred detection: temporal consistency + staged
        verification + correction for keyframe `kf_id`."""
        if kf_id >= int(tracker.map.n_kf):
            return False        # the keyframe was culled/remapped away
        ids = np.asarray(ids)
        groups = np.asarray(groups)
        self.stats["queries"] += 1
        # detection-gate observability (round-3 verdict: candidates:0 in
        # stereo-inertial with no way to tell WHICH gate was responsible)
        if n_elig is not None:
            ne = int(n_elig)
            self.stats["elig_last"] = ne
            if ne == 0:
                self.stats["elig_zero"] = self.stats.get("elig_zero", 0) + 1
        if scores is not None:
            bs = float(np.asarray(scores)[0])
            self.stats["best_score_max"] = max(
                self.stats.get("best_score_max", -1.0), bs)

        # temporal consistency (reference loopclosing.cc:303-391): a
        # candidate's covisibility group must intersect groups detected at
        # >= consistency_th consecutive keyframes before verification runs
        consistent = []
        new_groups = []
        for ci, cand in enumerate(ids):
            if cand < 0:
                continue
            self.stats["candidates"] += 1
            grp = frozenset(np.nonzero(groups[ci])[0].tolist())
            best = 0
            for prev_grp, cnt in self._cons_groups:
                if grp & prev_grp:
                    best = max(best, cnt)
            new_groups.append((grp, best + 1))
            if best + 1 >= self.consistency_th:
                consistent.append(int(cand))
        self._cons_groups = new_groups

        self.stats["consistent"] += len(consistent)
        for cand in consistent:
            if self._verify_and_correct(tracker, kf_id, cand):
                self.last_loop_kf = kf_id
                self.num_closed += 1
                self.stats["closed"] += 1
                self._cons_groups = []
                return True
        return False

    def _covisible_window(self, m, cand: int, n_window: int = 6):
        """Candidate-side keyframe window: the candidate + its best
        covisible keyframes (reference: vpCovKFi = candidate + 10
        covisibles, loopclosing.cc:567-576), padded to a FIXED width by
        repeating the candidate so shapes stay static. Returns
        (kf_ids (NW,) np.ndarray,)."""
        n_kf = int(m.n_kf)
        Wc = np.asarray(ms.covisibility_matrix(m))[cand, :n_kf]
        order = np.argsort(-Wc)
        covis = [int(k) for k in order[: n_window - 1] if Wc[k] > 0]
        ids = [cand] + covis
        while len(ids) < n_window:
            ids.append(cand)
        return np.asarray(ids[:n_window], np.int32)

    def _verify_and_correct(self, tracker, cur: int, cand: int) -> bool:
        m = tracker.map
        F = m.n_feat

        # ---- stage 1: descriptor gate (reference SearchByBoW over the
        # candidate's covisible window, loopclosing.cc:567-576 +
        # orb_matcher.cc:697). The candidate side contributes the MAP
        # POINTS of candidate + best covisibles; the current side
        # contributes ALL its features (not only map-point-bound ones) —
        # the round-2 mutual map-point-only gate killed 187/261 consistent
        # candidates at the production operating point. BoW buckets are a
        # CPU indexing trick; the TPU equivalent is one dense masked
        # Hamming matmul over the window's point set.
        win_ids = self._covisible_window(m, cand)
        win_j = jnp.asarray(win_ids)
        obs_w = m.kf_obs_mp[win_j].reshape(-1)             # (NW*F,)
        rows_w = jnp.clip(obs_w, 0, m.max_mp - 1)
        # duplicate-point suppression across the window (a point observed
        # by several window keyframes — and the padding repeats — must
        # count once): keep the FIRST occurrence of each point row
        first_occ = jnp.zeros(m.max_mp + 1, jnp.int32).at[
            jnp.where(obs_w >= 0, rows_w, m.max_mp)].max(
            jnp.arange(obs_w.shape[0], dtype=jnp.int32) + 1, mode="drop")
        is_first = (first_occ[rows_w] ==
                    jnp.arange(obs_w.shape[0], dtype=jnp.int32) + 1)
        has_w = (obs_w >= 0) & m.mp_valid[rows_w] & is_first
        idx, ok = matcher.match_masked(
            m.mp_desc[rows_w], m.kf_desc[cur],
            has_w[:, None] & m.kf_feat_valid[cur][None, :],
            max_dist=matcher.TH_LOW, ratio=0.75)
        # count DISTINCT matched current features
        idx_c = jnp.clip(idx, 0, F - 1)
        hit = jnp.zeros(F + 1, bool).at[
            jnp.where(ok, idx_c, F)].set(True, mode="drop")
        n_matches = int(jnp.sum(hit[:F]))
        if n_matches < max(15, int(20 * min(1.0, F / 1000.0) + 0.5)):
            self.stats["desc_fail"] += 1
            return False

        # ---- stage 2: Sim3 RANSAC on 3D-3D pairs (both endpoints carry a
        # map point; reference Sim3Solver over matched MapPoint pairs)
        mp_cand = rows_w
        mp_cur_row = m.kf_obs_mp[cur][idx_c]
        mp_cur = jnp.clip(mp_cur_row, 0, m.max_mp - 1)
        pair_ok = ok & (mp_cur_row >= 0) & m.mp_valid[mp_cur]

        pose_cand = lie.SE3(m.kf_pose.R[cand], m.kf_pose.t[cand])
        pose_cur = lie.SE3(m.kf_pose.R[cur], m.kf_pose.t[cur])
        x1 = lie.se3_apply(pose_cand, m.mp_pos[mp_cand])   # cand frame
        x2 = lie.se3_apply(pose_cur, m.mp_pos[mp_cur])     # cur frame
        # cand-side pixel reference: window points from covisibles carry no
        # observation in the candidate itself — use their projection into
        # the candidate camera (for points the candidate does observe this
        # coincides with the stored uv up to reprojection error); the dual
        # inlier check then measures the S_21 round-trip consistency
        from .. import cameras as _cams
        uv1 = _cams.project(self.cfg.cam_model, tracker.cam_params, x1)
        uv2 = m.kf_uv[cur][idx_c]

        # an initialized IMU makes scale observable — fix it in the Sim3
        # search (reference: bFixedScale = IsInertial && BA2 done,
        # loopclosing.cc:606)
        fix_scale = self.fix_scale or bool(
            getattr(tracker, "imu_initialized", False))
        res = sim3_ransac(
            x1, x2, pair_ok, uv1, uv2, tracker.cam_params,
            jax.random.PRNGKey(cur * 7919 + cand),
            fix_scale=fix_scale, min_inliers=15,
            cam_model=self.cfg.cam_model)
        if not bool(res.ok):
            self.stats["ransac_fail"] += 1
            # funnel observability: how many 3D-3D pairs entered and how
            # close the best hypothesis came (drives threshold tuning)
            self.stats["ransac_pairs_last"] = int(jnp.sum(pair_ok))
            self.stats["ransac_best_last"] = int(res.n_inliers)
            # pairs whose two sides are the SAME map row contribute only
            # the identity-drift transform; a funnel dominated by them
            # means the "loop" candidate shares its points with the query
            self.stats["same_row_last"] = int(
                jnp.sum(pair_ok & (mp_cand == mp_cur)))
            return False

        n_pairs = x1.shape[0]
        S_ref, inlier, n_in = optimize_sim3(
            res.sim, x1, x2, pair_ok, uv1, uv2,
            jnp.ones(n_pairs), jnp.ones(n_pairs), tracker.cam_params,
            fix_scale=fix_scale, cam_model=self.cfg.cam_model)
        if int(n_in) < 20:
            self.stats["sim3_fail"] += 1
            return False

        # staged Sim3-guided projection validation (reference
        # loopclosing.cc:640-813: nProjMatches >= 50, refine, recount >= 80)
        ok_proj, S_final = self._sim3_guided_validation(
            tracker, cur, cand, S_ref, fix_scale)
        if not ok_proj:
            self.stats["proj_fail"] += 1
            return False

        self._correct_loop(tracker, cur, cand, S_final)
        return True

    def _project_candidate_points(self, tracker, cur: int, rows, has,
                                  x_cand, S: lie.Sim3, radius: float):
        """Sim3-guided projection of candidate-side points into the current
        keyframe (reference ORBmatcher::SearchByProjection Sim3 variants,
        orb_matcher.cc:391/490). Returns (midx, mok) per candidate row."""
        m = tracker.map
        h, w = self.cfg.image_size
        x_pred = lie.sim3_apply(S, x_cand)              # current camera
        from .. import cameras
        uv_pred = cameras.project(self.cfg.cam_model, tracker.cam_params,
                                  x_pred)
        vis = (has & (x_pred[..., 2] > 0.05)
               & (uv_pred[..., 0] >= 0) & (uv_pred[..., 0] < w)
               & (uv_pred[..., 1] >= 0) & (uv_pred[..., 1] < h))
        d = jnp.linalg.norm(x_pred, axis=-1)
        L = self.cfg.orb.num_levels
        pred_oct = ms.predict_scale(
            d, m.mp_max_dist[rows] * S.s, L)
        return matcher.search_by_projection(
            uv_pred, m.mp_desc[rows], vis, pred_oct,
            m.kf_uv[cur], m.kf_desc[cur], m.kf_feat_valid[cur],
            m.kf_octave[cur],
            radius=radius * ms.SCALE_FACTOR ** pred_oct.astype(jnp.float32),
            max_dist=matcher.TH_LOW, octave_window=2)

    def _sim3_guided_validation(self, tracker, cur: int, cand: int,
                                S: lie.Sim3, fix_scale: bool):
        """Stage 2+3 of the reference's loop verification: project the
        candidate neighbourhood's points through S into the current
        keyframe, require >= proj_th matched features, refine the Sim3 on
        the guided matches, re-project at the refined S and require
        >= proj_ref_th (reference loopclosing.cc:640-813). Returns
        (ok, refined S)."""
        m = tracker.map
        F = m.n_feat
        pose_cand = lie.SE3(m.kf_pose.R[cand], m.kf_pose.t[cand])
        pose_cur = lie.SE3(m.kf_pose.R[cur], m.kf_pose.t[cur])

        # candidate-side point set: the candidate + its best covisible
        # keyframes (reference loopclosing.cc:567-576 projects the
        # vpCovKFi window's points), duplicates suppressed
        win_ids = self._covisible_window(m, cand)
        obs_exp = m.kf_obs_mp[jnp.asarray(win_ids)].reshape(-1)
        rows = jnp.clip(obs_exp, 0, m.max_mp - 1)
        first_occ = jnp.zeros(m.max_mp + 1, jnp.int32).at[
            jnp.where(obs_exp >= 0, rows, m.max_mp)].max(
            jnp.arange(obs_exp.shape[0], dtype=jnp.int32) + 1, mode="drop")
        is_first = (first_occ[rows] ==
                    jnp.arange(obs_exp.shape[0], dtype=jnp.int32) + 1)
        has = (obs_exp >= 0) & m.mp_valid[rows] & is_first
        x_cand = lie.se3_apply(pose_cand, m.mp_pos[rows])

        midx, mok = self._project_candidate_points(
            tracker, cur, rows, has, x_cand, S, radius=8.0)
        # count UNIQUE matched current-KF features
        hit = jnp.zeros(F + 1, bool).at[
            jnp.where(mok, jnp.clip(midx, 0, F - 1), F)].set(
            True, mode="drop")
        n_proj = int(jnp.sum(hit[:F]))
        if n_proj < self.proj_th:
            return False, S

        # refine on the guided matches of the candidate row itself (both
        # endpoints carry 3D there: x1 = cand-camera point, x2 = the point
        # bound to the matched current feature)
        obs_c = m.kf_obs_mp[cand]
        rows_c = jnp.clip(obs_c, 0, m.max_mp - 1)
        has_c = (obs_c >= 0) & m.mp_valid[rows_c]
        x1 = lie.se3_apply(pose_cand, m.mp_pos[rows_c])
        midx_c, mok_c = self._project_candidate_points(
            tracker, cur, rows_c, has_c, x1, S, radius=8.0)
        f_idx = jnp.clip(midx_c, 0, F - 1)
        cur_obs = m.kf_obs_mp[cur][f_idx]
        both = mok_c & has_c & (cur_obs >= 0) \
            & m.mp_valid[jnp.clip(cur_obs, 0, m.max_mp - 1)]
        x2 = lie.se3_apply(pose_cur,
                           m.mp_pos[jnp.clip(cur_obs, 0, m.max_mp - 1)])
        uv1 = m.kf_uv[cand]
        uv2 = m.kf_uv[cur][f_idx]
        S2, _, _ = optimize_sim3(
            S, x1, x2, both, uv1, uv2, jnp.ones(F), jnp.ones(F),
            tracker.cam_params, fix_scale=fix_scale,
            cam_model=self.cfg.cam_model)

        # recount at the refined transform with a tighter window
        midx2, mok2 = self._project_candidate_points(
            tracker, cur, rows, has, x_cand, S2, radius=5.0)
        hit2 = jnp.zeros(F + 1, bool).at[
            jnp.where(mok2, jnp.clip(midx2, 0, F - 1), F)].set(
            True, mode="drop")
        n_ref = int(jnp.sum(hit2[:F]))
        if n_ref < self.proj_ref_th:
            return False, S
        return True, S2

    # -- correction ---------------------------------------------------------

    def _correct_loop(self, tracker, cur: int, cand: int,
                      S_cand_to_cur: lie.Sim3) -> None:
        """Pose-graph correction (reference CorrectLoop, loopclosing.cc:883).

        S_cand_to_cur maps candidate-camera points into the current camera:
        x_cur ~ S * x_cand, so the drift-corrected current pose (as a Sim3
        world->camera) is  S_cur_corr = S * S_cand.
        """
        m = tracker.map
        n_kf = int(m.n_kf)
        K = n_kf

        # current Sim3 poses (s=1) for all keyframes
        poses = lie.Sim3(
            jnp.ones(K, jnp.float32),
            m.kf_pose.R[:K], m.kf_pose.t[:K])

        def sim_of(k):
            return lie.Sim3(poses.s[k], poses.R[k], poses.t[k])

        # ---- essential-graph edges ------------------------------------
        # covisibility spanning tree over the LIVE keyframes (reference:
        # each keyframe's tree parent is its most-covisible predecessor,
        # keyframe.cc ChangeParent/UpdateConnections; children of erased
        # keyframes are re-parented, SetBadFlag — culled rows here must
        # not anchor edges). Falls back to the previous live keyframe when
        # a keyframe shares no points with any predecessor.
        live = np.nonzero(np.asarray(m.kf_valid[:K]))[0]
        Wc = np.asarray(ms.covisibility_matrix(m))[:K, :K]
        live_mask = np.zeros(K, bool)
        live_mask[live] = True
        edge_i, edge_j, rels, weights = [], [], [], []
        for a_idx in range(1, len(live)):
            b = int(live[a_idx])
            w_row = np.where(live_mask[:b], Wc[b, :b], -1)
            parent = int(np.argmax(w_row)) if w_row.max() > 0 \
                else int(live[a_idx - 1])
            edge_i.append(parent)
            edge_j.append(b)
            rels.append(lie.sim3_compose(sim_of(b),
                                         lie.sim3_inverse(sim_of(parent))))
            weights.append(1.0)
        # strong covisibility edges (weight >= 30 shared points)
        strong = np.argwhere(np.triu(Wc, 2) >= 30)
        for i, j in strong[:200]:
            edge_i.append(int(i))
            edge_j.append(int(j))
            rels.append(lie.sim3_compose(sim_of(int(j)),
                                         lie.sim3_inverse(sim_of(int(i)))))
            weights.append(1.0)
        # previously accepted loop edges re-enter every later solve
        # (reference: mspLoopEdges feed OptimizeEssentialGraph,
        # keyframe.h:237-243, optimizer.cc:1443+)
        for (pi, pj, prel) in self.loop_edges:
            if pi < K and pj < K:
                edge_i.append(pi)
                edge_j.append(pj)
                rels.append(prel)
                weights.append(float(K))
        # the measured loop edge: S_cur_corr = S * S_cand, so
        # rel(cand -> cur) = S_cur S_cand^-1 |_measured = S_cand_to_cur
        edge_i.append(cand)
        edge_j.append(cur)
        rels.append(S_cand_to_cur)
        weights.append(float(len(edge_i)))  # strong anchor weight
        self.loop_edges.append((cand, cur, S_cand_to_cur))

        rel_b = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *rels)
        fixed = np.zeros(K, bool)
        fixed[cand] = True
        fixed |= ~np.asarray(m.kf_valid[:K])   # culled rows: no edges, pin

        prob = PoseGraphProblem(
            poses=poses,
            edge_i=jnp.asarray(edge_i, jnp.int32),
            edge_j=jnp.asarray(edge_j, jnp.int32),
            edge_rel=rel_b,
            edge_weight=jnp.asarray(weights, jnp.float32),
            edge_valid=jnp.ones(len(edge_i), bool),
            fixed=jnp.asarray(fixed),
        )
        # inertial maps: 4-DoF correction (yaw + translation only — roll,
        # pitch and scale are pinned by gravity; reference:
        # OptimizeEssentialGraph4DoF for IsInertial maps, loopclosing.cc:1084)
        four_dof = bool(getattr(tracker, "imu_initialized", False))
        new_poses, costs = optimize_pose_graph(prob, iters=25,
                                               four_dof=four_dof)

        # ---- apply: keyframe poses (SE3 with scale folded into t) ------
        # Sim3 world->cam (s, R, t) acts x_c = s R x_w + t; the equivalent
        # SE3 after rescaling the world is (R, t / s) (reference
        # loopclosing.cc corrected-pose recovery [R t/s]).
        corr_R = new_poses.R
        corr_t = new_poses.t / new_poses.s[:, None]

        # ---- apply: map points via their reference keyframe ------------
        # X_new = S_r_new^-1 ( S_r_old (X_old) )
        ref = jnp.clip(m.mp_ref_kf, 0, K - 1)
        old_ref = lie.Sim3(poses.s[ref], poses.R[ref], poses.t[ref])
        new_ref = lie.Sim3(new_poses.s[ref], new_poses.R[ref],
                           new_poses.t[ref])
        Xc = lie.sim3_apply(old_ref, m.mp_pos)
        X_new = lie.sim3_apply(lie.sim3_inverse(new_ref), Xc)
        mp_pos = jnp.where(m.mp_valid[:, None], X_new, m.mp_pos)
        # viewing normals follow the rotation part of the same per-point
        # correction (reference: UpdateNormalAndDepth after the loop
        # rewrite) — stale normals fail the view-angle gate after large
        # corrections
        R_corr = jnp.einsum("mji,mjk->mik", new_ref.R, old_ref.R)  # (M,3,3)
        nrm = jnp.einsum("mij,mj->mi", R_corr, m.mp_normal)
        mp_normal = jnp.where(m.mp_valid[:, None], nrm, m.mp_normal)

        kf_R = m.kf_pose.R.at[:K].set(corr_R)
        kf_t = m.kf_pose.t.at[:K].set(corr_t)
        tracker.map = m._replace(
            kf_pose=lie.SE3(kf_R, kf_t),
            mp_pos=mp_pos,
            mp_normal=mp_normal,
        )
        # keep tracker state consistent with the rewritten map; an
        # in-flight background local BA solved the PRE-correction geometry
        # — drop it (reference: mbAbortBA before CorrectLoop's rewrite)
        tracker._pending_lba = None
        tracker.cur_pose = lie.SE3(kf_R[cur], kf_t[cur])
        tracker.velocity = lie.se3_identity()
        tracker._reset_prior()

        # ---- fuse: project loop-side points into the current KF and
        # merge duplicate observations (simplified SearchAndFuse,
        # loopclosing.cc:1982) ------------------------------------------
        self._fuse_duplicates(tracker, cur, cand)

        # ---- global BA (reference: RunGlobalBundleAdjustment thread,
        # loopclosing.cc:2117). The reference's size gate applies ONLY to
        # IMU-initialized maps: `!isImuInitialized() || (KFs < 200 &&
        # single map)` (loopclosing.cc:1096-1098) — a VISUAL map gets a
        # GBA after every closure at any size. The chunked LM switches to
        # the matrix-free PCG reduced solve past 64 keyframes, so large
        # visual GBAs are affordable here too. A closure while a GBA is
        # in flight replaces the snapshot (reference aborts the running
        # GBA before correcting, loopclosing.cc:892-904). ---------------
        if (not bool(getattr(tracker, "imu_initialized", False))
                or n_kf <= self.max_kf_for_gba):
            if getattr(tracker, "mesh", None) is not None:
                self._global_ba_dist(tracker)
            else:
                self.pending_gba = ChunkedGBA(tracker, self.cfg)
                if not self.background_gba:
                    self.gba_drain(tracker)

    # -- chunked background GBA --------------------------------------------

    def gba_tick(self, tracker) -> None:
        """Advance the in-flight GBA by one device chunk (called once per
        tracked frame); adopt the result into the live map when done.
        Landmarks with very many observations have their Schur cross terms
        truncated to max_obs=16 — the dropped terms make the step
        quasi-Newton, but monotone acceptance still guarantees descent."""
        g = self.pending_gba
        if g is None:
            return
        if g.step():
            self._adopt_gba(tracker)

    def gba_drain(self, tracker) -> None:
        """Run the in-flight GBA to completion (save/export sync point —
        the reference joins the GBA thread on Shutdown, system.cc:509)."""
        while self.pending_gba is not None:
            self.gba_tick(tracker)

    def _global_ba_dist(self, tracker) -> None:
        """Loop-closure GBA through the landmark-sharded distributed Schur
        reduction (parallel/dist_ba.py) when the engine runs on a mesh;
        the result is merged through the same correction propagation as
        the chunked path."""
        from ..parallel.dist_ba import distributed_bundle_adjustment
        g = ChunkedGBA(tracker, self.cfg)
        g.lm.poses, g.lm.points, _ = distributed_bundle_adjustment(
            g.prob, tracker.mesh, cam_model=self.cfg.cam_model, iters=3,
            iters_second=7)
        g.lm.phase = 2
        self.pending_gba = g
        self._adopt_gba(tracker)

    def _adopt_gba(self, tracker) -> None:
        """Merge a finished GBA into the live map (reference correction
        propagation under map lock, loopclosing.cc:2162-2327): snapshot
        rows take the optimized values; keyframes inserted during the
        solve are corrected through their relative pose to the newest
        snapshot keyframe, new points through their reference keyframe."""
        g = self.pending_gba
        self.pending_gba = None
        m = tracker.map
        K0, M0 = g.snap_n_kf, g.snap_n_mp
        Kc, Mc = m.max_kf, m.max_mp
        gR, gt, gpts = g.poses.R, g.poses.t, g.points
        # tables may have GROWN since the snapshot (doubling growth keeps
        # row identity, compaction would have aborted the solve) — pad
        if gR.shape[0] < Kc:
            pad = Kc - gR.shape[0]
            gR = jnp.concatenate(
                [gR, jnp.broadcast_to(jnp.eye(3, dtype=gR.dtype),
                                      (pad, 3, 3))])
            gt = jnp.concatenate([gt, jnp.zeros((pad, 3), gt.dtype)])
        if gpts.shape[0] < Mc:
            gpts = jnp.concatenate(
                [gpts, jnp.zeros((Mc - gpts.shape[0], 3), gpts.dtype)])
        snap_kf = jnp.arange(Kc) < K0
        snap_mp = jnp.arange(Mc) < M0

        # right-delta anchored at the newest snapshot keyframe: keyframes
        # created during the solve keep their relative pose to it
        a = K0 - 1
        T_a_now = lie.SE3(m.kf_pose.R[a], m.kf_pose.t[a])
        T_a_corr = lie.SE3(gR[a], gt[a])
        Dr = lie.se3_compose(lie.se3_inverse(T_a_now), T_a_corr)
        prop = lie.se3_compose(m.kf_pose, Dr)
        kf_R = jnp.where(snap_kf[:, None, None], gR, prop.R)
        kf_t = jnp.where(snap_kf[:, None], gt, prop.t)

        # points: snapshot rows adopt the GBA positions; newer rows follow
        # their reference keyframe's correction
        ref = jnp.clip(m.mp_ref_kf, 0, Kc - 1)
        T_r_now = lie.SE3(m.kf_pose.R[ref], m.kf_pose.t[ref])
        T_r_corr = lie.SE3(kf_R[ref], kf_t[ref])
        X_prop = lie.se3_apply(lie.se3_inverse(T_r_corr),
                               lie.se3_apply(T_r_now, m.mp_pos))
        mp_pos = jnp.where(snap_mp[:, None], gpts, X_prop)
        mp_pos = jnp.where(m.mp_valid[:, None], mp_pos, m.mp_pos)

        tracker.map = m._replace(kf_pose=lie.SE3(kf_R, kf_t), mp_pos=mp_pos)
        tracker._pending_lba = None   # solved pre-GBA geometry — drop
        if tracker.last_kf_id >= 0:
            tracker.cur_pose = lie.SE3(
                tracker.map.kf_pose.R[tracker.last_kf_id],
                tracker.map.kf_pose.t[tracker.last_kf_id])
        tracker._reset_prior()

    def _fuse_duplicates(self, tracker, cur: int, cand: int) -> None:
        """Merge map points duplicated across the loop: features of the
        current KF re-matched to candidate-side points adopt those points."""
        m = tracker.map
        F = m.n_feat
        pose_cur = lie.SE3(m.kf_pose.R[cur], m.kf_pose.t[cur])

        cand_obs = m.kf_obs_mp[cand]
        cand_mp = jnp.clip(cand_obs, 0, m.max_mp - 1)
        cand_has = (cand_obs >= 0) & m.kf_feat_valid[cand]

        # project candidate-side points into the corrected current KF
        from .tracker import _project_map_points
        h, w = self.cfg.image_size
        uv_pred, vis, depth = _project_map_points(
            m.mp_pos[cand_mp], cand_has & m.mp_valid[cand_mp], pose_cur,
            tracker.cam_params, self.cfg.cam_model, h, w)

        # predicted-level gate + level-scaled radius (reference
        # SearchAndFuse -> ORBmatcher::Fuse, orb_matcher.cc:1042)
        C_cur = -jnp.einsum("ji,j->i", pose_cur.R, pose_cur.t)
        d_cur = jnp.linalg.norm(m.mp_pos[cand_mp] - C_cur[None, :], axis=-1)
        num_levels = self.cfg.orb.num_levels
        pred_oct = ms.predict_scale(d_cur, m.mp_max_dist[cand_mp],
                                    num_levels)
        midx, mok = matcher.search_by_projection(
            uv_pred, m.mp_desc[cand_mp], vis,
            pred_oct,
            m.kf_uv[cur], m.kf_desc[cur], m.kf_feat_valid[cur],
            m.kf_octave[cur],
            radius=8.0 * ms.SCALE_FACTOR ** pred_oct.astype(jnp.float32),
            max_dist=matcher.TH_LOW, octave_window=1)

        # current-KF features matched to a loop point: rebind observation,
        # and invalidate the now-duplicate current-side point
        midx_c = jnp.clip(midx, 0, F - 1)
        cur_obs_row = m.kf_obs_mp[cur]
        dup = mok & (cur_obs_row[midx_c] >= 0) \
            & (cur_obs_row[midx_c] != cand_mp)
        from ..utils import masked_set
        new_cur_obs = masked_set(cur_obs_row, midx_c, cand_mp, mok)
        kfo = m.kf_obs_mp.at[cur].set(new_cur_obs)
        # invalidate replaced duplicates
        dup_rows = jnp.clip(cur_obs_row[midx_c], 0, m.max_mp - 1)
        mp_valid = masked_set(m.mp_valid, dup_rows,
                              jnp.zeros(F, bool), dup)
        tracker.map = m._replace(kf_obs_mp=kfo, mp_valid=mp_valid)
