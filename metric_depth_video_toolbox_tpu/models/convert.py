"""Checkpoint conversion: torch state dicts -> Flax param trees.

The reference downloads torch checkpoints for every model family
(download_weights.py:80-133). This module maps those state dicts onto our
Flax modules so real weights can be used when available; without
checkpoints the models run with random init (same compute graph, which is
what the throughput benchmarks measure). Zero-egress environments skip
the download and load from a local path.

Conversion conventions:
  torch Linear  (out, in)        -> flax Dense kernel (in, out): transpose
  torch Conv2d  (out, in, kh, kw)-> flax Conv kernel (kh, kw, in, out)
  torch LayerNorm weight/bias    -> flax scale/bias
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def load_checkpoint(path):
    """Load a converted Flax checkpoint (.msgpack via flax or .pkl)."""
    if path.endswith(".msgpack"):
        from flax import serialization
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    with open(path, "rb") as f:
        return pickle.load(f)


def save_checkpoint(path, params):
    from flax import serialization
    import jax
    params = jax.tree.map(np.asarray, params)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(params))
    return path


def _t(x):
    return np.asarray(x, np.float32)


def linear(sd, prefix):
    out = {"kernel": _t(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def conv(sd, prefix):
    w = _t(sd[prefix + ".weight"])  # (out, in, kh, kw)
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def conv_transpose(sd, prefix):
    w = _t(sd[prefix + ".weight"])  # torch: (in, out, kh, kw)
    out = {"kernel": w.transpose(2, 3, 0, 1)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def layernorm(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]),
            "bias": _t(sd[prefix + ".bias"])}


def convert_dinov2_vit(state_dict, cfg):
    """torch DINOv2/DA-V2 backbone state dict -> our models.vit.ViT params.

    Expected torch layout (DINOv2): patch_embed.proj, cls_token,
    pos_embed, blocks.N.{norm1, attn.qkv, attn.proj, ls1.gamma, norm2,
    mlp.fc1, mlp.fc2, ls2.gamma}, norm.
    """
    sd = {k.replace("pretrained.", ""): v for k, v in state_dict.items()}
    p = {
        "patch_embed": conv(sd, "patch_embed.proj"),
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "norm": layernorm(sd, "norm"),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        p[f"block{i}"] = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "attn": {"qkv": linear(sd, f"{b}.attn.qkv"),
                     "proj": linear(sd, f"{b}.attn.proj")},
            "ls1": {"gamma": _t(sd[f"{b}.ls1.gamma"])},
            "norm2": layernorm(sd, f"{b}.norm2"),
            "mlp": {"fc1": linear(sd, f"{b}.mlp.fc1"),
                    "fc2": linear(sd, f"{b}.mlp.fc2")},
            "ls2": {"gamma": _t(sd[f"{b}.ls2.gamma"])},
        }
    return p


def convert_dpt_head(state_dict, cfg):
    """torch DA-V2 ``depth_head`` state dict -> our models.dpt.DPTHead
    params. Requires DPTConfig(torch_resize=True, fast_head=False) so
    the op graph is weight-exact (learned resize layers + original head
    conv order).

    Torch layout: depth_head.projects.N, depth_head.resize_layers.N,
    depth_head.scratch.layerN_rn, depth_head.scratch.refinenetN
    (.resConfUnit{1,2}.conv{1,2}, .out_conv), scratch.output_conv1,
    scratch.output_conv2.{0,2}.
    """
    sd = {k.replace("depth_head.", ""): v for k, v in state_dict.items()
          if k.startswith("depth_head.")} or dict(state_dict)
    p = {}
    for i in range(4):
        p[f"project{i}"] = conv(sd, f"projects.{i}")
        p[f"scratch{i}"] = {
            "kernel": _t(sd[f"scratch.layer{i + 1}_rn.weight"]
                         ).transpose(2, 3, 1, 0)}
    p["resize0"] = conv_transpose(sd, "resize_layers.0")
    p["resize1"] = conv_transpose(sd, "resize_layers.1")
    p["resize3"] = conv(sd, "resize_layers.3")

    def rcu(prefix):
        return {"conv1": conv(sd, prefix + ".conv1"),
                "conv2": conv(sd, prefix + ".conv2")}

    # torch refinenet4 fuses the COARSEST level (our fusion3) down to
    # refinenet1 = finest (our fusion0); refinenet4 has no resConfUnit1
    # skip in DA-V2 (single input), matching our fusion3 call.
    for ours, theirs in (("fusion3", 4), ("fusion2", 3), ("fusion1", 2),
                         ("fusion0", 1)):
        rn = f"scratch.refinenet{theirs}"
        blk = {"rcu2": rcu(rn + ".resConfUnit2"),
               "project": conv(sd, rn + ".out_conv")}
        if f"{rn}.resConfUnit1.conv1.weight" in sd and ours != "fusion3":
            blk["rcu1"] = rcu(rn + ".resConfUnit1")
        p[ours] = blk
    p["head_conv1"] = conv(sd, "scratch.output_conv1")
    p["head_conv2"] = conv(sd, "scratch.output_conv2.0")
    p["head_conv3"] = conv(sd, "scratch.output_conv2.2")
    return p


def convert_da2(state_dict, vit_cfg):
    """Full Depth-Anything-V2 checkpoint -> our DepthAnything params
    ({'params': {'backbone': ..., 'head': ...}}). Use with
    DPTConfig(torch_resize=True, fast_head=False)."""
    return {"params": {
        "backbone": convert_dinov2_vit(state_dict, vit_cfg),
        "head": convert_dpt_head(state_dict, vit_cfg),
    }}


def convert_torch_file(path, kind, cfg=None):
    """Load a torch checkpoint file (CPU) and convert by ``kind``."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    if kind == "dinov2":
        return convert_dinov2_vit(sd, cfg)
    if kind == "da2":
        return convert_da2(sd, cfg)
    raise ValueError(f"unknown checkpoint kind: {kind}")


# --- weight registry (reference download_weights.py) -----------------------

WEIGHT_REGISTRY = {
    "vda": {"kind": "video_depth", "files": [
        "video_depth_anything_vits.pth", "video_depth_anything_vitl.pth"]},
    "da_v2_metric": {"kind": "dinov2", "files": [
        "depth_anything_v2_metric_hypersim_vitl.pth"]},
    "raft": {"kind": "raft", "files": ["raft-large.pth"]},
    "stereocrafter": {"kind": "svd_unet", "files": ["stereocrafter"]},
    "u2net": {"kind": "u2net", "files": ["u2net.onnx"]},
}


def download_weights(name, dest_dir="weights"):
    """Reference download_weights.py equivalent. In zero-egress
    environments this only validates that files already exist locally."""
    os.makedirs(dest_dir, exist_ok=True)
    entry = WEIGHT_REGISTRY[name]
    missing = [f for f in entry["files"]
               if not os.path.exists(os.path.join(dest_dir, f))]
    if missing:
        raise FileNotFoundError(
            f"weights for '{name}' not present locally: {missing}. "
            f"Place the torch checkpoints in {dest_dir}/ and run "
            f"models.convert.convert_torch_file on them.")
    return [os.path.join(dest_dir, f) for f in entry["files"]]
