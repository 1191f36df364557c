"""Multi-device sharding on the virtual 8-CPU mesh: mesh construction,
param partitioning, sharded train step, sharded stereo batch."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from metric_depth_video_toolbox_tpu.models import depth_anything as da
from metric_depth_video_toolbox_tpu.models import dpt as dpt_mod
from metric_depth_video_toolbox_tpu.models import vit as vit_mod
from metric_depth_video_toolbox_tpu.parallel import mesh as mesh_mod
from metric_depth_video_toolbox_tpu.parallel import sharding as shr
from metric_depth_video_toolbox_tpu.parallel import train


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_mesh_shapes():
    m = mesh_mod.make_mesh(8, model=2)
    assert m.shape == {"data": 4, "model": 2}
    fm = mesh_mod.frame_mesh(8)
    assert fm.shape == {"data": 8}


def test_param_specs_shard_attention():
    cfg = vit_mod.VIT_TINY
    model = vit_mod.ViT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
    m = mesh_mod.make_mesh(8, model=2)
    specs = jax.tree_util.tree_map_with_path(
        lambda p, l: shr.param_spec(p, l), params)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    qkv = [s for p, s in flat if "qkv" in str(p) and "kernel" in str(p)]
    proj = [s for p, s in flat if "proj" in str(p) and "kernel" in str(p)]
    assert all(s == P(None, "model") for s in qkv) and qkv
    assert all(s == P("model", None) for s in proj) and proj
    del m


def test_sharded_train_step_runs():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_entry_compiles():
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_stereo_batch_shards_over_frames():
    from functools import partial

    from metric_depth_video_toolbox_tpu.ops import codec, geometry as geo
    from metric_depth_video_toolbox_tpu.pipeline import stereo

    h, w = 32, 48
    cfg = stereo.StereoConfig(width=w, height=h, out_width=w, out_height=h)
    mesh = mesh_mod.frame_mesh(8)
    depth = np.full((8, h, w), 5.0, np.float32)
    rgb = np.asarray(codec.encode_depth_frame(jnp.asarray(depth), 100.0))
    color = np.full((8, h, w, 3), 90, np.uint8)
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)

    step = jax.jit(jax.vmap(partial(stereo.stereo_frame, cfg=cfg),
                            in_axes=(0, 0, None, None, None, None, None)))
    with mesh:
        rgb_s = jax.device_put(jnp.asarray(rgb), shr.batch_sharding(mesh, 4))
        col_s = jax.device_put(jnp.asarray(color),
                               shr.batch_sharding(mesh, 4))
        out = step(rgb_s, col_s, k, k, jnp.eye(4), jnp.asarray(0.0),
                   jnp.asarray(1.0))
        img = np.asarray(out["image"])
    assert img.shape == (8, h, 2 * w, 3)


def test_single_frame_engine_data_parallel_matches(rng):
    """SingleFrameEngine with the frame batch sharded over the 8-device
    CPU mesh produces the same depths as the unsharded path."""
    import numpy as np

    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage

    frames = rng.integers(0, 255, (9, 28, 28, 3)).astype(np.uint8)
    eng_dp = dstage.SingleFrameEngine(size="vitt", max_depth=10.0,
                                      input_size=28, data_parallel=True)
    d_dp = eng_dp.infer_video(frames, batch=8)
    eng_1 = dstage.SingleFrameEngine(size="vitt", max_depth=10.0,
                                     input_size=28, data_parallel=False,
                                     params=eng_dp._params)
    d_1 = eng_1.infer_video(frames, batch=8)
    assert d_dp.shape == (9, 28, 28)
    # bf16 compute: cross-device layout changes reduction order
    assert np.abs(d_dp - d_1).mean() < 5e-3
    assert np.abs(d_dp - d_1).max() < 5e-2


def test_vda_window_shards_over_time_axis(rng):
    """VideoDepthAnything window sharded over the 8-device CPU mesh
    (sequence-parallel: per-frame ViT is DP, temporal attention crosses
    devices) matches the unsharded result."""
    import numpy as np

    from metric_depth_video_toolbox_tpu.pipeline import depth as dstage

    frames = rng.integers(0, 255, (10, 28, 28, 3)).astype(np.uint8)
    eng_dp = dstage.VDAEngine(size="vitt", input_size=28, window=8,
                              overlap=2, max_depth=10.0,
                              metric_anchor_frames=4, data_parallel=True)
    assert eng_dp._mesh is not None  # 8 devices divide window 8
    d_dp = eng_dp.infer_video(frames)
    eng_1 = dstage.VDAEngine(size="vitt", input_size=28, window=8,
                             overlap=2, max_depth=10.0,
                             metric_anchor_frames=4, data_parallel=False,
                             params=eng_dp._params,
                             anchor_params=eng_dp._anchor_params)
    d_1 = eng_1.infer_video(frames)
    assert d_dp.shape == (10, 28, 28)
    assert np.abs(d_dp - d_1).mean() < 1e-2


def test_infill_chunk_time_sharding_matches(rng):
    """Diffusion infill with the chunk time axis sharded over the mesh
    == unsharded output (the 225-frame inspatio preset's layout: DP over
    frames, temporal attention crossing devices)."""
    import numpy as np
    from metric_depth_video_toolbox_tpu.models import diffusion as dif
    from metric_depth_video_toolbox_tpu.pipeline import infill_diffusion

    frames = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    mask = np.zeros((8, 32, 32), bool)
    mask[:, :, 10:16] = True

    base = infill_diffusion.DiffusionInfillEngine(
        cfg=dif.DIFFUSION_TINY, work_hw=(32, 32), chunk=8, overlap=2,
        data_parallel=False, rng_seed=7)
    out_a = np.asarray(base.infill_chunk(frames, mask))

    sharded = infill_diffusion.DiffusionInfillEngine(
        cfg=dif.DIFFUSION_TINY, work_hw=(32, 32), chunk=8, overlap=2,
        data_parallel=True, rng_seed=7, params=base._params)
    assert sharded._mesh is not None, "8 virtual devices expected"
    out_b = np.asarray(sharded.infill_chunk(frames, mask))
    np.testing.assert_allclose(out_a.astype(np.float32),
                               out_b.astype(np.float32), atol=2.0)
