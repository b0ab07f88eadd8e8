"""ORB descriptor matching as batched bit math.

TPU-era ``ORBmatcher`` (``src/ORBmatcher.cc``): Hamming distances become
XOR + ``lax.population_count`` over [N1, N2, 8] uint32 blocks, the ratio
test / rotation-consistency histogram / projection windows become masked
argmin reductions. Thresholds mirror the reference: TH_LOW=50, TH_HIGH=100,
HISTO_LENGTH=30 (``src/ORBmatcher.cc:35-41``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsorb_slam_tpu.core.camera import Camera
from gsorb_slam_tpu.frontend.orb import ORBFeatures

TH_LOW = 50
TH_HIGH = 100
HISTO_LENGTH = 30
BIG = jnp.int32(1 << 30)


def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """[N1, 8] x [N2, 8] uint32 -> [N1, N2] int32 Hamming distances
    (``DescriptorDistance`` ``src/ORBmatcher.cc:1647``, batched)."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


class MatchResult(NamedTuple):
    idx2: jnp.ndarray  # [N1] best match in set 2 (-1 = none)
    dist: jnp.ndarray  # [N1] Hamming distance of best match
    valid: jnp.ndarray  # [N1] bool


def _rotation_consistency(
    angle1: jnp.ndarray, angle2_at_match: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 most common
    of 30 histogram bins (``ComputeThreeMaxima`` usage across ORBmatcher)."""
    rot = (angle1 - angle2_at_match) * (180.0 / jnp.pi)
    rot = jnp.where(rot < 0, rot + 360.0, rot)
    bins = jnp.clip((rot * HISTO_LENGTH / 360.0).astype(jnp.int32), 0, HISTO_LENGTH - 1)
    hist = jnp.zeros(HISTO_LENGTH, jnp.int32).at[bins].add(valid.astype(jnp.int32))
    top3 = jax.lax.top_k(hist, 3)[0]
    # The reference drops bins under 10% of the max bin too (":1640").
    keep_bin = (hist >= top3[2]) & (hist.astype(jnp.float32) > 0.1 * top3[0])
    return valid & keep_bin[bins]


@functools.partial(
    jax.jit, static_argnames=("max_dist", "ratio", "check_rotation")
)
def match_descriptors(
    f1: ORBFeatures,
    f2: ORBFeatures,
    max_dist: int = TH_LOW,
    ratio: float = 0.9,
    check_rotation: bool = True,
) -> MatchResult:
    """Brute-force best-match with Lowe ratio + rotation consistency —
    the ``SearchForInitialization``/``SearchByBoW`` matching core."""
    D = hamming_matrix(f1.descriptors, f2.descriptors)
    D = jnp.where(f2.valid[None, :], D, BIG)
    D = jnp.where(f1.valid[:, None], D, BIG)
    best2 = jnp.argmin(D, axis=1)
    d_best = jnp.take_along_axis(D, best2[:, None], axis=1)[:, 0]
    D2 = D.at[jnp.arange(D.shape[0]), best2].set(BIG)
    d_second = jnp.min(D2, axis=1)
    valid = (
        f1.valid
        & (d_best <= max_dist)
        & (d_best.astype(jnp.float32) < ratio * d_second.astype(jnp.float32))
    )
    # Mutual-best check (the reference enforces uniqueness of target idx).
    rev_best = jnp.argmin(jnp.where(valid[:, None], D, BIG), axis=0)
    mutual = rev_best[best2] == jnp.arange(D.shape[0])
    valid = valid & mutual
    if check_rotation:
        valid = _rotation_consistency(f1.angle, f2.angle[best2], valid)
    return MatchResult(
        idx2=jnp.where(valid, best2, -1), dist=d_best, valid=valid
    )


@functools.partial(
    jax.jit, static_argnames=("max_dist", "ratio", "check_rotation")
)
def search_by_bow(
    f1: ORBFeatures,
    f2: ORBFeatures,
    nodes1: jnp.ndarray,  # [N1] direct-index node ids (-1 invalid)
    nodes2: jnp.ndarray,  # [N2]
    max_dist: int = TH_LOW,
    ratio: float = 0.75,
    check_rotation: bool = True,
) -> MatchResult:
    """Direct-index-bucketed matching (``SearchByBoW``
    ``src/ORBmatcher.cc:159,522``): only descriptor pairs whose vocabulary
    descent lands in the same tree node (``levels_up`` above the leaf) are
    candidates — DBoW2's ``FeatureVector`` bucket walk as a masked distance
    matrix. Same ratio / rotation-consistency gates as the reference."""
    D = hamming_matrix(f1.descriptors, f2.descriptors)
    same = (nodes1[:, None] == nodes2[None, :]) & (nodes1 >= 0)[:, None]
    D = jnp.where(same & f1.valid[:, None] & f2.valid[None, :], D, BIG)
    best2 = jnp.argmin(D, axis=1)
    d_best = jnp.take_along_axis(D, best2[:, None], axis=1)[:, 0]
    D2 = D.at[jnp.arange(D.shape[0]), best2].set(BIG)
    d_second = jnp.min(D2, axis=1)
    valid = (
        f1.valid
        & (d_best <= max_dist)
        & (d_best.astype(jnp.float32) < ratio * d_second.astype(jnp.float32))
    )
    rev_best = jnp.argmin(jnp.where(valid[:, None], D, BIG), axis=0)
    mutual = rev_best[best2] == jnp.arange(D.shape[0])
    valid = valid & mutual
    if check_rotation:
        valid = _rotation_consistency(f1.angle, f2.angle[best2], valid)
    return MatchResult(idx2=jnp.where(valid, best2, -1), dist=d_best, valid=valid)


def fundamental_from_poses(T1_cw: jnp.ndarray, T2_cw: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """F12 mapping image-1 points to epipolar lines in image 2
    (``ComputeF12`` ``src/LocalMapping.cc``)."""
    T21 = T2_cw @ jnp.linalg.inv(T1_cw)
    R = T21[:3, :3]
    t = T21[:3, 3]
    tx = jnp.array(
        [[0.0, -t[2], t[1]], [t[2], 0.0, -t[0]], [-t[1], t[0], 0.0]]
    )
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ tx @ R @ Kinv


@functools.partial(jax.jit, static_argnames=("max_dist", "epi_th"))
def search_for_triangulation(
    f1: ORBFeatures,
    f2: ORBFeatures,
    F12: jnp.ndarray,
    unmatched1: jnp.ndarray,  # [N1] bool: keypoints without a map point
    unmatched2: jnp.ndarray,
    max_dist: int = TH_LOW,
    epi_th: float = 3.84,
) -> MatchResult:
    """Descriptor matching constrained to the epipolar line — candidates for
    new-point triangulation (``SearchForTriangulation``
    ``src/ORBmatcher.cc:657``)."""
    D = hamming_matrix(f1.descriptors, f2.descriptors)
    x1 = jnp.concatenate([f1.uv, jnp.ones_like(f1.uv[:, :1])], axis=1)
    lines2 = x1 @ F12.T  # [N1, 3] epipolar lines in image 2
    x2 = jnp.concatenate([f2.uv, jnp.ones_like(f2.uv[:, :1])], axis=1)
    num = (lines2[:, None, :] * x2[None, :, :]).sum(-1) ** 2
    den = jnp.maximum(lines2[:, None, 0] ** 2 + lines2[:, None, 1] ** 2, 1e-12)
    epi_ok = num / den < epi_th
    mask = (
        epi_ok
        & (f1.valid & unmatched1)[:, None]
        & (f2.valid & unmatched2)[None, :]
    )
    D = jnp.where(mask, D, BIG)
    best = jnp.argmin(D, axis=1)
    d_best = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    valid = d_best <= max_dist
    return MatchResult(idx2=jnp.where(valid, best, -1), dist=d_best, valid=valid)


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray  # [NL] matched right-image u (-1 = none)
    depth: jnp.ndarray  # [NL] bf / disparity (0 = none)
    valid: jnp.ndarray  # [NL] bool


@functools.partial(jax.jit, static_argnames=("bf", "min_z", "max_dist"))
def compute_stereo_matches(
    fL: ORBFeatures,
    fR: ORBFeatures,
    bf: float,
    min_z: float,
    scale_factors: jnp.ndarray,  # [n_levels] per-octave scale (1.2^l)
    max_dist: int = (TH_HIGH + TH_LOW) // 2,
) -> StereoMatches:
    """Sparse stereo depth by descriptor matching along rectified rows —
    ``Frame::ComputeStereoMatches`` (``src/Frame.cc``): candidates within
    a +-2*scale row band, disparity in [minD, maxD] with maxD = bf/minZ,
    best Hamming match under ``thOrbDist`` = (TH_HIGH+TH_LOW)/2. The
    reference's SAD sub-pixel parabola refinement needs patch access; the
    descriptor-level match (+-0.5 px) feeds the same (u, v, uR) stereo
    edges and depth = bf / disparity.

    Rectified-pair convention: uL - uR = disparity >= 0.
    """
    max_d = bf / max(min_z, 1e-3)
    D = hamming_matrix(fL.descriptors, fR.descriptors)
    row_tol = 2.0 * scale_factors[jnp.clip(fL.octave, 0, len(scale_factors) - 1)]
    dv = jnp.abs(fL.uv[:, None, 1] - fR.uv[None, :, 1])
    disp = fL.uv[:, None, 0] - fR.uv[None, :, 0]
    # Same-ish pyramid level (reference checks octave within +-1).
    d_oct = jnp.abs(fL.octave[:, None] - fR.octave[None, :])
    ok = (
        (dv <= row_tol[:, None])
        & (disp > 0.0)
        & (disp <= max_d)
        & (d_oct <= 1)
        & fL.valid[:, None]
        & fR.valid[None, :]
    )
    D = jnp.where(ok, D, BIG)
    best = jnp.argmin(D, axis=1)
    d_best = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    valid = d_best <= max_dist
    uR = jnp.take_along_axis(fR.uv[:, 0][None, :], best[None, :], axis=1)[0]
    disparity = jnp.maximum(fL.uv[:, 0] - uR, 0.01)
    depth = jnp.where(valid, bf / disparity, 0.0)
    return StereoMatches(
        u_right=jnp.where(valid, uR, -1.0),
        depth=depth,
        valid=valid,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "max_dist", "octave_lo", "octave_hi", "use_view_cos_radius",
    ),
)
def search_by_projection(
    world: jnp.ndarray,  # [M, 3] map-point positions
    descriptors: jnp.ndarray,  # [M, 8] representative descriptors
    pt_valid: jnp.ndarray,  # [M] bool
    frame: ORBFeatures,
    T_cw: jnp.ndarray,
    cam: Camera,
    radius: float = 15.0,
    max_dist: int = TH_HIGH,
    normals: jnp.ndarray | None = None,  # [M, 3] mean viewing directions
    min_dists: jnp.ndarray | None = None,  # [M] scale-invariance min dist
    max_dists: jnp.ndarray | None = None,  # [M] scale-invariance max dist
    scale_factors: jnp.ndarray | None = None,  # [L] per-octave 1.2^l
    octave_lo: int = 1,  # candidate octaves [pred-octave_lo, pred+octave_hi]
    octave_hi: int = 0,
    use_view_cos_radius: bool = True,  # False: Fuse semantics (r = th*sf)
) -> MatchResult:
    """Project map points into the frame and match within a pixel window
    (``SearchByProjection`` ``src/ORBmatcher.cc:45,1328``; the reference's
    per-cell grid lookup becomes a masked distance matrix). With
    ``normals``, points viewed >60 degrees off their mean viewing direction
    are excluded (``Frame::isInFrustum`` viewCos < 0.5 gate).

    With ``min_dists``/``max_dists``/``scale_factors`` the scale-invariance
    machinery is live (``MapPoint::PredictScale`` ``src/MapPoint.cc:386`` +
    ``GetMin/MaxDistanceInvariance`` ``include/MapPoint.h:79-82``):
    points outside [0.8*minD, 1.2*maxD] of the camera are dropped
    (``Frame::isInFrustum``), the search window becomes
    ``RadiusByViewingCos * scale_factors[predicted_level]`` scaled by
    ``radius`` acting as the reference's ``th`` multiplier, and candidate
    keypoints are restricted to octaves near the predicted level
    (``src/ORBmatcher.cc:45-157``). Entries with ``max_dists <= 0`` skip
    the gates (points created before scale bookkeeping)."""
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]
    xc = jnp.matmul(world, R.T, precision=jax.lax.Precision.HIGHEST) + t
    z = xc[:, 2]
    in_front = z > 0.05
    safe_z = jnp.where(in_front, z, 1.0)
    u = cam.fx * xc[:, 0] / safe_z + cam.cx
    v = cam.fy * xc[:, 1] / safe_z + cam.cy
    on_img = (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    ok = pt_valid & in_front & on_img
    cam_center = -R.T @ t
    view = world - cam_center[None, :]
    dist3d = jnp.linalg.norm(view, axis=-1)
    view_cos = None
    if normals is not None:
        vn = view / jnp.maximum(dist3d[:, None], 1e-9)
        view_cos = jnp.sum(vn * normals, axis=-1)
        has_normal = jnp.linalg.norm(normals, axis=-1) > 0.5
        ok = ok & (~has_normal | (view_cos > 0.5))
        view_cos = jnp.where(has_normal, view_cos, 1.0)

    use_scale = (
        min_dists is not None and max_dists is not None
        and scale_factors is not None
    )
    if use_scale:
        has_range = max_dists > 0
        ok = ok & (
            ~has_range
            | ((dist3d >= 0.8 * min_dists) & (dist3d <= 1.2 * max_dists))
        )
        L = scale_factors.shape[0]
        log_sf = jnp.log(scale_factors[min(1, L - 1)])
        ratio = jnp.maximum(max_dists, 1e-6) / jnp.maximum(dist3d, 1e-6)
        pred = jnp.clip(
            jnp.ceil(jnp.log(ratio) / jnp.maximum(log_sf, 1e-6)).astype(jnp.int32),
            0, L - 1,
        )
        if not use_view_cos_radius:
            base_r = 1.0
        elif view_cos is None:
            base_r = 4.0
        else:
            base_r = jnp.where(view_cos > 0.998, 2.5, 4.0)
        fallback_r = radius * (4.0 if use_view_cos_radius else 1.0)
        r_pt = jnp.where(
            has_range, radius * base_r * scale_factors[pred], fallback_r
        )
        kp_oct = frame.octave[None, :]
        oct_ok = (
            ~has_range[:, None]
            | ((kp_oct >= pred[:, None] - octave_lo)
               & (kp_oct <= pred[:, None] + octave_hi))
        )
    else:
        r_pt = jnp.full(world.shape[0], radius, jnp.float32)
        oct_ok = True

    du = u[:, None] - frame.uv[None, :, 0]
    dv = v[:, None] - frame.uv[None, :, 1]
    within = (du * du + dv * dv) <= (r_pt * r_pt)[:, None]  # [M, N]

    D = hamming_matrix(descriptors, frame.descriptors)
    D = jnp.where(within & oct_ok & frame.valid[None, :] & ok[:, None], D, BIG)
    best = jnp.argmin(D, axis=1)
    d_best = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    valid = ok & (d_best <= max_dist)
    return MatchResult(idx2=jnp.where(valid, best, -1), dist=d_best, valid=valid)


def _sim3_directional(
    world: jnp.ndarray,  # [M, 3] map points of the SOURCE keyframe (by feature)
    desc: jnp.ndarray,  # [M, 8] their representative descriptors
    pvalid: jnp.ndarray,  # [M] bool (has point & not already matched)
    min_d: jnp.ndarray,  # [M] scale-invariance min distance (raw)
    max_d: jnp.ndarray,  # [M] scale-invariance max distance (raw; <=0 = no range)
    feats: "ORBFeatures",  # target keyframe features
    A_R: jnp.ndarray,  # [3, 3] scaled rotation of the world->target-camera map
    A_t: jnp.ndarray,  # [3]
    cam: Camera,
    scale_factors: jnp.ndarray,  # [L]
    th: float,
    max_dist: int,
) -> jnp.ndarray:
    """One direction of ``SearchBySim3`` (``src/ORBmatcher.cc:1102-1226``):
    transform source map points into the target camera through the
    (scaled-rigid) composite ``A``, gate on depth / image bounds /
    scale-invariance range in the TRANSFORMED frame (``dist3D =
    |p3Dc2|``, exactly the reference), search a ``th * sf[pred]`` radius
    restricted to octaves [pred-1, pred], and return the best-Hamming
    feature index per point (-1 = none)."""
    xc = jnp.matmul(world, A_R.T, precision=jax.lax.Precision.HIGHEST) + A_t
    z = xc[:, 2]
    ok = pvalid & (z > 0.0)
    safe_z = jnp.where(z > 0.0, z, 1.0)
    u = cam.fx * xc[:, 0] / safe_z + cam.cx
    v = cam.fy * xc[:, 1] / safe_z + cam.cy
    ok = ok & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    dist3d = jnp.linalg.norm(xc, axis=-1)
    has_range = max_d > 0
    ok = ok & (
        ~has_range | ((dist3d >= 0.8 * min_d) & (dist3d <= 1.2 * max_d))
    )
    L = scale_factors.shape[0]
    log_sf = jnp.log(scale_factors[min(1, L - 1)])
    ratio = jnp.maximum(max_d, 1e-6) / jnp.maximum(dist3d, 1e-6)
    pred = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.maximum(log_sf, 1e-6)).astype(jnp.int32),
        0, L - 1,
    )
    r_pt = jnp.where(has_range, th * scale_factors[pred], th * 4.0)
    kp_oct = feats.octave[None, :]
    oct_ok = (
        ~has_range[:, None]
        | ((kp_oct >= pred[:, None] - 1) & (kp_oct <= pred[:, None]))
    )
    du = u[:, None] - feats.uv[None, :, 0]
    dv = v[:, None] - feats.uv[None, :, 1]
    within = (du * du + dv * dv) <= (r_pt * r_pt)[:, None]
    D = hamming_matrix(desc, feats.descriptors)
    D = jnp.where(within & oct_ok & feats.valid[None, :] & ok[:, None], D, BIG)
    best = jnp.argmin(D, axis=1)
    d_best = jnp.take_along_axis(D, best[:, None], axis=1)[:, 0]
    return jnp.where(ok & (d_best <= max_dist), best, -1)


@functools.partial(jax.jit, static_argnames=("th", "max_dist"))
def search_by_sim3(
    world1: jnp.ndarray,  # [N1, 3] KF1 per-FEATURE map points (zeros = none)
    desc1: jnp.ndarray,  # [N1, 8]
    valid1: jnp.ndarray,  # [N1] has-point & not already matched
    min_d1: jnp.ndarray,  # [N1]
    max_d1: jnp.ndarray,  # [N1]
    feats1: "ORBFeatures",
    world2: jnp.ndarray,  # [N2, 3] KF2 per-feature map points
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_d2: jnp.ndarray,
    max_d2: jnp.ndarray,
    feats2: "ORBFeatures",
    T1_cw: jnp.ndarray,  # [4, 4]
    T2_cw: jnp.ndarray,  # [4, 4]
    s12: jnp.ndarray,  # [] scale of the cam1<-cam2 similarity
    R12: jnp.ndarray,  # [3, 3]
    t12: jnp.ndarray,  # [3]
    cam: Camera,
    scale_factors: jnp.ndarray,  # [L]
    th: float = 7.5,
    max_dist: int = TH_HIGH,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``SearchBySim3`` (``src/ORBmatcher.cc:1102-1288``): grow the match
    set between two loop keyframes using a Sim3 estimate. Both directions
    are searched (KF1 points into KF2 through ``sR21``, KF2 points into KF1
    through ``sR12``) and only MUTUAL agreements are kept
    (``vnMatch1[i1]==idx2 && vnMatch2[idx2]==i1``, ``:1290-1308``).

    Returns ``(match12 [N1] int32 feature index in KF2 or -1, n_new)``.
    """
    R1w, t1w = T1_cw[:3, :3], T1_cw[:3, 3]
    R2w, t2w = T2_cw[:3, :3], T2_cw[:3, 3]
    sR12 = s12 * R12
    sR21 = (1.0 / s12) * R12.T
    t21 = -jnp.matmul(sR21, t12)
    # world -> cam2' (through cam1): sR21 (R1w x + t1w) + t21
    A2_R = jnp.matmul(sR21, R1w, precision=jax.lax.Precision.HIGHEST)
    A2_t = jnp.matmul(sR21, t1w) + t21
    # world -> cam1' (through cam2): sR12 (R2w x + t2w) + t12
    A1_R = jnp.matmul(sR12, R2w, precision=jax.lax.Precision.HIGHEST)
    A1_t = jnp.matmul(sR12, t2w) + t12

    m12 = _sim3_directional(
        world1, desc1, valid1, min_d1, max_d1, feats2, A2_R, A2_t, cam,
        scale_factors, th, max_dist,
    )
    m21 = _sim3_directional(
        world2, desc2, valid2, min_d2, max_d2, feats1, A1_R, A1_t, cam,
        scale_factors, th, max_dist,
    )
    # Mutual check.
    j = jnp.maximum(m12, 0)
    mutual = (m12 >= 0) & (m21[j] == jnp.arange(m12.shape[0]))
    match12 = jnp.where(mutual, m12, -1)
    return match12, jnp.sum(mutual)
