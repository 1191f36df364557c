"""Shared torch mirror modules for weight-exactness tests.

A compact torch re-implementation of the DINOv2 ViT graph with module
names matching the published checkpoint layout (patch_embed.proj,
cls_token, pos_embed, blocks.N.{norm1, attn.qkv/proj, ls1/ls2.gamma,
norm2, mlp.fc1/fc2}, norm; LayerNorm eps 1e-6, exact-erf GELU,
LayerScale residuals) — the backbone every Depth-Anything-family
converter consumes. Supports DA3's input-adaptive cross-view attention
(blocks listed in ``cross`` see all views' tokens as one sequence).
"""

import torch
import torch.nn as tnn
import torch.nn.functional as F


class TLayerScale(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(d))

    def forward(self, x):
        return x * self.gamma


class TAttention(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.qkv = tnn.Linear(d, 3 * d)
        self.proj = tnn.Linear(d, d)
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, n, d)
        return self.proj(out)


class TMlp(tnn.Module):
    def __init__(self, d):
        super().__init__()
        self.fc1 = tnn.Linear(d, 4 * d)
        self.fc2 = tnn.Linear(4 * d, d)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))  # exact erf GELU


class TBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn = TAttention(d, heads)
        self.ls1 = TLayerScale(d)
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.mlp = TMlp(d)
        self.ls2 = TLayerScale(d)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class TPatchEmbed(tnn.Module):
    def __init__(self, d, patch):
        super().__init__()
        self.proj = tnn.Conv2d(3, d, patch, patch)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class TDino(tnn.Module):
    """DINOv2 returning norm'd intermediate patch grids at
    ``out_indices`` (get_intermediate_layers(norm=True) convention).
    ``cross``: block indices using DA3 cross-view attention (all views'
    tokens concatenated into one sequence; same weights)."""

    def __init__(self, d, depth, heads, patch, n_tok, out_indices,
                 cross=()):
        super().__init__()
        self.patch_embed = TPatchEmbed(d, patch)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = tnn.Parameter(torch.zeros(1, n_tok + 1, d))
        self.blocks = tnn.ModuleList(
            [TBlock(d, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(d, eps=1e-6)
        self.out_indices = tuple(out_indices)
        self.cross = set(cross)

    def forward(self, images):
        """images: (V, 3, H, W) already ImageNet-normalized ->
        list of (V, gh, gw, D) patch grids."""
        v = images.shape[0]
        x = self.patch_embed.proj(images)  # (V, D, gh, gw)
        gh, gw = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)  # (V, N, D)
        x = torch.cat([self.cls_token.expand(v, -1, -1), x], dim=1)
        x = x + self.pos_embed
        n = x.shape[1]
        feats = []
        for i, blk in enumerate(self.blocks):
            if i in self.cross:
                x = blk(x.reshape(1, v * n, -1)).reshape(v, n, -1)
            else:
                x = blk(x)
            if i in self.out_indices:
                feats.append(self.norm(x))
        return [f[:, 1:].reshape(v, gh, gw, -1) for f in feats]


def normalize_imagenet(frames_vhwc):
    """(V, H, W, 3) [0,1] float tensor -> normalized (V, 3, H, W)."""
    mean = torch.tensor(IMAGENET_MEAN)
    std = torch.tensor(IMAGENET_STD)
    return ((frames_vhwc - mean) / std).permute(0, 3, 1, 2)
