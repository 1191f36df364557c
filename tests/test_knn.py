"""ops.knn: the TPU equivalent of UniDepth's CUDA KNN extension
(SURVEY.md §2.4) — verified against brute-force numpy."""

import numpy as np

from metric_depth_video_toolbox_tpu.ops import knn


def _brute(query, ref, k):
    d = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = rng.normal(0, 1, (257, 3)).astype(np.float32)  # non-tile-aligned
    r = rng.normal(0, 1, (401, 3)).astype(np.float32)
    sq, idx = knn.knn_points(q, r, k=5, tile=64)
    bd, bi = _brute(q, r, 5)
    np.testing.assert_allclose(np.asarray(sq), bd, rtol=1e-4, atol=1e-4)
    # indices match wherever distances are not tied
    same = np.asarray(idx) == bi
    ties = np.abs(np.diff(bd, axis=1)) < 1e-6
    assert same[:, 0].all()
    assert (same | np.pad(ties, ((0, 0), (1, 0)))).mean() > 0.999


def test_knn_ref_mask_excludes():
    rng = np.random.default_rng(1)
    r = rng.normal(0, 1, (64, 3)).astype(np.float32)
    q = r[:8] + 1e-3
    mask = np.ones(64, bool)
    mask[:8] = False  # the true nearest neighbours are invalid
    _, idx = knn.knn_points(q, r, k=3, ref_mask=mask)
    assert (np.asarray(idx) >= 8).all()


def test_knn_interpolate_exact_on_ref_points():
    rng = np.random.default_rng(2)
    r = rng.normal(0, 1, (128, 3)).astype(np.float32)
    vals = rng.normal(0, 1, (128, 4)).astype(np.float32)
    # querying the reference points themselves: nearest dist 0 ->
    # weight collapses onto the exact value
    out = np.asarray(knn.knn_interpolate(r, r, vals, k=3))
    np.testing.assert_allclose(out, vals, atol=1e-4)


def test_knn_normals_plane():
    rng = np.random.default_rng(3)
    xy = rng.uniform(-1, 1, (256, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.full((256, 1), 2.0, np.float32)], axis=1)
    view = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (256, 1))
    n = np.asarray(knn.knn_normals(pts, k=8, view_dirs=view))
    # a z=2 plane viewed down +z: normals all (0, 0, -1)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)
    assert (n[:, 2] < 0).all()
