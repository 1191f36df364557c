"""CLI: optical flow video (reference optical_flow.py — RAFT over
streamed pairs, flow -> RGB video, OOM batch-halving)."""

from __future__ import annotations

import argparse

import numpy as np


def build_parser(parser=None):
    p = parser or argparse.ArgumentParser(
        description="Dense optical flow video (RAFT-class).")
    p.add_argument("--color_video", type=str, required=True)
    p.add_argument("--max_frames", default=-1, type=int)
    p.add_argument("--batch_size", "--batch", dest="batch_size",
                   default=4, type=int,
                   help="pairs per forward pass (streamed)")
    p.add_argument("--last_mode", choices=["prev", "self", "none"],
                   default="prev",
                   help="how to emit a flow frame for the final input "
                        "frame: duplicate the previous flow, compute "
                        "flow(last,last), or write one fewer frame")
    p.add_argument("--cpu", action="store_true", help="force CPU")
    p.add_argument("--amp", action="store_true",
                   help="accepted for reference-flag parity; compute is "
                        "already bfloat16 on the MXU")
    p.add_argument("--channels_last", action="store_true",
                   help="accepted for parity; layout is always NHWC")
    p.add_argument("--checkpoint", type=str)
    return p


def run(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from metric_depth_video_toolbox_tpu.io import video as vio
    from metric_depth_video_toolbox_tpu.models import raft
    from metric_depth_video_toolbox_tpu.utils.host import robust_call

    reader = vio.VideoReader(args.color_video, max_frames=args.max_frames)
    h8 = (reader.height // 8) * 8
    w8 = (reader.width // 8) * 8
    model = raft.RAFT(raft.RAFTConfig())
    params = None
    if args.checkpoint:
        from metric_depth_video_toolbox_tpu.models import convert
        params = convert.load_checkpoint(args.checkpoint)

    @jax.jit
    def step(p, a, b):
        flow = model.apply(p, a, b)  # batch-native
        return jax.vmap(raft.flow_to_rgb)(flow)

    out_path = args.color_video + "_flow.mkv"
    writer = vio.VideoWriter(out_path, reader.fps, reader.width,
                             reader.height)
    prev = None
    batch_a, batch_b = [], []
    n = 0
    last_rgb = [None]  # last emitted flow frame (for last_mode=prev)

    def flush():
        nonlocal n, params
        if not batch_a:
            return
        a_np = np.stack(batch_a)[:, :h8, :w8]
        b_np = np.stack(batch_b)[:, :h8, :w8]
        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                         jnp.asarray(a_np[0]),
                                         jnp.asarray(b_np[0]))
        # OOM adaptation: halve the batch and retry
        # (reference optical_flow.py:204-212)
        start = 0
        chunk = a_np.shape[0]
        while start < a_np.shape[0]:
            try:
                rgb = robust_call(step, params,
                                  jnp.asarray(a_np[start:start + chunk]),
                                  jnp.asarray(b_np[start:start + chunk]))
            except Exception as e:
                if "RESOURCE_EXHAUSTED" in str(e) and chunk > 1:
                    chunk = max(1, chunk // 2)
                    print(f"OOM: halving flow batch to {chunk}")
                    continue
                raise
            for f in rgb:
                writer.write(f)
                last_rgb[0] = np.asarray(f)
                n += 1
            start += chunk
        batch_a.clear()
        batch_b.clear()

    for frame in reader:
        if prev is not None:
            batch_a.append(prev)
            batch_b.append(frame)
            if len(batch_a) == args.batch_size:
                flush()
        prev = frame
    # one flow frame for the final input frame (reference
    # optical_flow.py:242-248 last_mode semantics)
    if args.last_mode == "self" and prev is not None:
        batch_a.append(prev)
        batch_b.append(prev)
    flush()
    if args.last_mode == "prev" and last_rgb[0] is not None:
        writer.write(last_rgb[0])
        n += 1
    reader.close()
    writer.commit(n)
    print(f"flow video saved: {out_path}")
    return out_path


def main(argv=None):
    from metric_depth_video_toolbox_tpu.utils.platform import apply_platform_env
    apply_platform_env()
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
