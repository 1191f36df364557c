"""Point-tracking stage: color video -> ``*_tracking.json``.

Reference ``track_points_in_video.py``: CoTracker3 over 120-frame clips,
grid query points filtered by feature density, track identity carried
across clip boundaries by re-seeding the nearest new grid point with the
old global id (:215-243, :323-356). Same orchestration here, with the
tracking core being the jitted pyramidal-LK scan (or CoTrackerLite) from
``models.tracker`` — one device program per clip instead of per frame.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.models import tracker as trk
from metric_depth_video_toolbox_tpu.utils.host import to_host


def _make_clip_tracker(engine, weights):
    """Returns clip_track(frames_u8, pts, valid) -> (traj, vis) for the
    chosen core: the jitted pyramidal-LK scan (default) or the
    CoTracker3-class learned tracker (reference
    track_points_in_video.py:264-271 loads cotracker3_offline)."""
    if engine != "cotracker3":
        return lambda clip, pts, ok: tuple(map(to_host, trk.lk_track_clip(
            jnp.asarray(clip), jnp.asarray(pts), jnp.asarray(ok))))
    from metric_depth_video_toolbox_tpu.models import cotracker as ct
    params, cfg = None, None
    if weights:
        from metric_depth_video_toolbox_tpu.models import convert
        if weights.endswith((".pth", ".pt", ".bin")):
            import torch
            sd = torch.load(weights, map_location="cpu",
                            weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
            sd = {k: v.numpy() for k, v in sd.items()}
            params = convert.convert_cotracker3(sd)
            cfg = convert.cotracker3_config_from_state_dict(sd)
        else:
            params = convert.load_checkpoint(weights)
    eng = ct.CoTracker3Engine(cfg, params=params)
    return eng.track_clip


def track_video(color_video, output=None, clip_len=120, grid=36,
                max_frames=-1, engine="lk", reseed_radius=12.0,
                save_viz=False, rng_seed=0, downscale=1,
                nr_iterations=1, steps_between_init=None, weights=None):
    """Track grid points through the whole video in overlapping clips.

    Returns the tracking-json path. Track rows are [global_id, x, y] per
    frame (reference :415-426). ``downscale`` tracks at reduced
    resolution and scales coordinates back (reference --downscale);
    ``nr_iterations`` repeats the whole pass with different grid offsets
    for denser coverage (--nr_iterations); ``steps_between_init`` is the
    clip stride, giving staggered overlapping streams with identity
    reseeding at the overlap (--steps_bewtwen_track_init, reference
    :323-356).
    """
    frames, fps = vio.read_video_frames(color_video, max_frames=max_frames)
    t_total, h, w = frames.shape[:3]
    rng = np.random.default_rng(rng_seed)
    clip_track = _make_clip_tracker(engine, weights)

    track_frames = frames
    if downscale > 1:
        th, tw = h // downscale, w // downscale
        import jax
        track_frames = np.asarray(jax.image.resize(
            jnp.asarray(frames, jnp.float32), (t_total, th, tw, 3),
            "bilinear")).astype(np.uint8)

    stride = steps_between_init or (clip_len - 1)
    stride = max(1, min(stride, clip_len - 1)) if clip_len > 1 else 1

    out_frames = [[] for _ in range(t_total)]
    next_gid = 0

    for _ in range(max(1, nr_iterations)):
        prev_traj = None   # (T_clip, N, 2) of the previous clip
        prev_vis = None
        prev_gids = None
        prev_start = 0
        written_until = 0
        start = 0
        while start < t_total:
            end = min(start + clip_len, t_total)
            clip = track_frames[start:end]
            pts, ok = trk.generate_grid_queries(clip[0], grid=grid,
                                                rng=rng)

            # identity reseeding: grid points near a still-alive track
            # from the previous clip AT THIS CLIP'S START FRAME inherit
            # its global id (reference :215-243)
            gids = -np.ones(pts.shape[0], np.int64)
            if prev_traj is not None:
                oi = start - prev_start
                if 0 <= oi < prev_traj.shape[0]:
                    alive = prev_vis[oi] > 0
                    ppts = prev_traj[oi, alive]
                    pids = prev_gids[alive]
                    if ppts.shape[0]:
                        d2 = ((pts[:, None, :] - ppts[None]) ** 2).sum(-1)
                        nearest = d2.argmin(1)
                        near_ok = d2[np.arange(pts.shape[0]),
                                     nearest] < reseed_radius ** 2
                        taken = set()
                        for i in np.argsort(
                                d2[np.arange(pts.shape[0]), nearest]):
                            j = nearest[i]
                            if near_ok[i] and ok[i] > 0 and j not in taken:
                                gids[i] = pids[j]
                                taken.add(j)
            fresh = (gids < 0) & (ok > 0)
            gids[fresh] = np.arange(next_gid, next_gid + fresh.sum())
            next_gid += int(fresh.sum())

            traj, vis = clip_track(clip, pts, ok)
            traj = np.asarray(traj)
            vis = np.asarray(vis)

            for fi in range(end - start):
                if start + fi < written_until:
                    continue  # covered by the previous stream
                alive = (vis[fi] > 0) & (gids >= 0)
                rows = np.stack([gids[alive].astype(np.float32),
                                 traj[fi, alive, 0] * downscale,
                                 traj[fi, alive, 1] * downscale],
                                axis=-1)
                if len(out_frames[start + fi]):
                    rows = np.concatenate(
                        [np.asarray(out_frames[start + fi]).reshape(-1, 3),
                         rows])
                out_frames[start + fi] = rows
            written_until = end

            prev_traj, prev_vis, prev_gids = traj, vis, gids
            prev_start = start
            if end == t_total:
                break
            start = min(start + stride, t_total - 1)

    output = output or (color_video + "_tracking.json")
    sidecar.save_tracking(output, [np.asarray(f, np.float32).reshape(-1, 3)
                                   for f in out_frames])

    if save_viz:
        viz = frames.copy()
        colors = rng.integers(64, 255, (next_gid + 1, 3))
        for fi, rows in enumerate(out_frames):
            for gid, x, y in np.asarray(rows).reshape(-1, 3):
                xi, yi = int(x), int(y)
                if 0 <= xi < w and 0 <= yi < h:
                    viz[fi, max(0, yi - 1):yi + 2,
                        max(0, xi - 1):xi + 2] = colors[int(gid) % len(colors)]
        vio.save_rgb_video(viz, output + "_tracked.mkv", fps)
    return output
