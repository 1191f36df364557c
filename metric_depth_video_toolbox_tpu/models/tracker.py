"""Point tracking across video frames.

Fills the role of CoTracker3 in the reference
(track_points_in_video.py:266: torch.hub CoTracker3-offline). Two engines:

- ``PyramidalLKTracker``: classical pyramidal Lucas-Kanade, pure jnp —
  works with no trained weights, fully jitted: one lax.scan over frames,
  all tracks advanced in parallel with fixed GN iterations per level.
  This is the default engine (deterministic, testable, fast on the VPU).
- ``CoTrackerLite``: a compact learned tracker (conv feature net +
  correlation + iterative refinement) kept weight-convertible for parity
  with the reference's learned tracker.

Also provides the grid query generator with corner-response filtering —
the reference seeds a randomized 36x36 grid masked by ORB feature density
(track_points_in_video.py:107-186); here the density mask is a Shi-Tomasi
corner response (structure-tensor min eigenvalue), the classical
equivalent of ORB's FAST corners, computed on device.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from metric_depth_video_toolbox_tpu.ops import image as im


# ---------------------------------------------------------------------------
# Corner response + query grid
# ---------------------------------------------------------------------------

def _gray(img):
    return (img[..., 0] * 0.299 + img[..., 1] * 0.587
            + img[..., 2] * 0.114).astype(jnp.float32)


@jax.jit
def corner_response(img_u8):
    """Shi-Tomasi min-eigenvalue of the structure tensor, (H, W)."""
    g = _gray(img_u8.astype(jnp.float32))
    gx = im.filter2d(g, jnp.array([[-0.5, 0.0, 0.5]], jnp.float32))
    gy = im.filter2d(g, jnp.array([[-0.5], [0.0], [0.5]], jnp.float32))
    ixx = im.gaussian_blur(gx * gx, 5)
    iyy = im.gaussian_blur(gy * gy, 5)
    ixy = im.gaussian_blur(gx * gy, 5)
    tr = ixx + iyy
    det = ixx * iyy - ixy * ixy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    return tr / 2.0 - disc  # min eigenvalue


def generate_grid_queries(frame_u8, grid=36, min_response=None, rng=None,
                          jitter=True):
    """Randomized grid of query points, kept where the corner response is
    strong (reference generate_grid + mask_from_orb_features,
    track_points_in_video.py:107-186). Returns (N, 2) float [x, y] and a
    validity mask (fixed N = grid*grid)."""
    h, w = frame_u8.shape[:2]
    resp = np.asarray(corner_response(jnp.asarray(frame_u8)))
    if min_response is None:
        min_response = np.percentile(resp, 70.0)
    rng = rng or np.random.default_rng(0)
    xs = (np.arange(grid) + 0.5) * (w / grid)
    ys = (np.arange(grid) + 0.5) * (h / grid)
    gx, gy = np.meshgrid(xs, ys)
    if jitter:
        gx = gx + rng.uniform(-0.4, 0.4, gx.shape) * (w / grid)
        gy = gy + rng.uniform(-0.4, 0.4, gy.shape) * (h / grid)
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    pts[:, 0] = np.clip(pts[:, 0], 1, w - 2)
    pts[:, 1] = np.clip(pts[:, 1], 1, h - 2)
    xi = pts[:, 0].astype(int)
    yi = pts[:, 1].astype(int)
    ok = resp[yi, xi] > min_response
    return pts.astype(np.float32), ok.astype(np.float32)


# ---------------------------------------------------------------------------
# Pyramidal Lucas-Kanade
# ---------------------------------------------------------------------------

def _patch_coords(radius):
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(r, r, indexing="ij")
    return dx.reshape(-1), dy.reshape(-1)


def _sample(img, x, y):
    """Bilinear sample a (H, W) image at float coords, edge-clamped."""
    h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


@partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def lk_advance(prev_u8, next_u8, pts, levels=3, radius=4, iters=6):
    """Advance all (N, 2) points from prev frame to next frame.

    Pyramidal LK: coarse-to-fine Gauss-Newton on patch brightness
    constancy, every track in parallel (vmapped gathers). Returns
    (new_pts (N, 2), residual (N,)) where residual is the final mean
    absolute patch difference (high = lost track)."""
    g0 = _gray(prev_u8.astype(jnp.float32))
    g1 = _gray(next_u8.astype(jnp.float32))

    pyr0 = [g0]
    pyr1 = [g1]
    for _ in range(levels - 1):
        pyr0.append(im.gaussian_blur(pyr0[-1], 3)[::2, ::2])
        pyr1.append(im.gaussian_blur(pyr1[-1], 3)[::2, ::2])

    dx, dy = _patch_coords(radius)
    flow = jnp.zeros_like(pts)

    for lvl in range(levels - 1, -1, -1):
        scale = 2.0 ** lvl
        p0 = pts / scale
        f = flow / scale
        i0, i1 = pyr0[lvl], pyr1[lvl]

        def track_one(p, fl):
            px = p[0] + dx
            py = p[1] + dy
            t = _sample(i0, px, py)
            gx = (_sample(i0, px + 1, py) - _sample(i0, px - 1, py)) / 2
            gy = (_sample(i0, px, py + 1) - _sample(i0, px, py - 1)) / 2
            a11 = jnp.sum(gx * gx) + 1e-4
            a12 = jnp.sum(gx * gy)
            a22 = jnp.sum(gy * gy) + 1e-4
            det = a11 * a22 - a12 * a12

            def gn(_, fl):
                cur = _sample(i1, px + fl[0], py + fl[1])
                err = cur - t
                b1 = jnp.sum(err * gx)
                b2 = jnp.sum(err * gy)
                du = -(a22 * b1 - a12 * b2) / det
                dv = -(-a12 * b1 + a11 * b2) / det
                return fl + jnp.array([du, dv])

            fl = jax.lax.fori_loop(0, iters, gn, fl)
            res = jnp.mean(jnp.abs(_sample(i1, px + fl[0], py + fl[1]) - t))
            return fl, res

        flow_lvl, res = jax.vmap(track_one)(p0, f)
        flow = flow_lvl * scale

    return pts + flow, res


@partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def lk_track_clip(frames_u8, pts0, valid0, levels=3, radius=4, iters=6,
                  max_residual=12.0):
    """Track (N, 2) points through a whole (T, H, W, 3) clip with one
    lax.scan. Returns (T, N, 2) positions and (T, N) validity (tracks die
    when the residual explodes or they leave the frame)."""
    h, w = frames_u8.shape[1:3]

    def step(carry, next_frame):
        prev_frame, pts, valid = carry
        new_pts, res = lk_advance(prev_frame, next_frame, pts,
                                  levels=levels, radius=radius, iters=iters)
        inb = ((new_pts[:, 0] >= 1) & (new_pts[:, 0] < w - 1)
               & (new_pts[:, 1] >= 1) & (new_pts[:, 1] < h - 1))
        ok = valid * inb.astype(jnp.float32) * (res < max_residual)
        pts = jnp.where(ok[:, None] > 0, new_pts, pts)
        return (next_frame, pts, ok), (pts, ok)

    init = (frames_u8[0], pts0, valid0)
    _, (traj, vis) = jax.lax.scan(step, init, frames_u8[1:])
    traj = jnp.concatenate([pts0[None], traj], axis=0)
    vis = jnp.concatenate([valid0[None], vis], axis=0)
    return traj, vis


# ---------------------------------------------------------------------------
# Learned tracker (CoTracker-class role). NOTE: this is an original
# lightweight design (correlation + MLP refinement), NOT the CoTracker3
# architecture — upstream checkpoints do not map onto it. The production
# tracking path is the pyramidal-LK scan above; CoTrackerLite exists as
# the learned-tracker capability slot.
# ---------------------------------------------------------------------------

class ConvFeatureNet(nn.Module):
    """Stride-4 conv encoder producing per-frame feature maps."""
    dim: int = 64

    @nn.compact
    def __call__(self, frames):
        x = frames.astype(jnp.float32) / 255.0
        x = nn.Conv(self.dim // 2, (7, 7), strides=(2, 2), name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.dim, (5, 5), strides=(2, 2), name="c2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.dim, (3, 3), name="c3")(x)
        return x


class CoTrackerLite(nn.Module):
    """Iterative refinement tracker: correlate each track's query feature
    against a local window in every frame, predict position updates with a
    shared MLP. Scan over refinement iterations, all tracks/frames batched.
    """
    dim: int = 64
    window_radius: int = 3
    refine_iters: int = 4

    @nn.compact
    def __call__(self, frames, queries):
        """frames: (T, H, W, 3) uint8; queries: (N, 2) positions in frame 0.
        Returns (T, N, 2) trajectories."""
        feats = ConvFeatureNet(self.dim, name="fnet")(frames)  # (T,h,w,D)
        t, fh, fw, d = feats.shape
        scale = frames.shape[1] / fh

        qf = jax.vmap(lambda p: im.bilinear_sample(
            feats[0], p[None] / scale)[0])(queries)  # (N, D)

        dx, dy = _patch_coords(self.window_radius)
        mlp = nn.Sequential([nn.Dense(128), nn.relu, nn.Dense(64), nn.relu,
                             nn.Dense(2)])

        traj = jnp.broadcast_to(queries[None], (t,) + queries.shape)

        for _ in range(self.refine_iters):
            def refine_frame(feat_t, pos_t):
                def one(q, p):
                    px = p[0] / scale + dx
                    py = p[1] / scale + dy
                    patch = jax.vmap(
                        lambda x, y: im.bilinear_sample(
                            feat_t, jnp.stack([x, y])[None])[0])(px, py)
                    corr = patch @ q / jnp.sqrt(d * 1.0)
                    return mlp(corr) * scale
                return jax.vmap(one)(qf, pos_t)
            deltas = jax.vmap(refine_frame)(feats, traj)
            traj = traj + deltas
        return traj
