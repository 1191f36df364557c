"""Sharded training step for the depth models (DP x TP over a mesh).

The reference never trains — but a production depth-video framework needs
fine-tuning (metric heads are dataset-specific: hypersim vs vkitti,
reference other/metric_dpt_func.py:12). The loss is the standard
scale-shift-invariant depth loss + gradient matching. The step is one
jit-compiled program whose params/optimizer state shard by
``sharding.param_spec`` (TP) and whose batch shards over 'data' (DP);
XLA inserts the psum for gradient all-reduce over 'data' and the
collectives for TP activations over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from metric_depth_video_toolbox_tpu.parallel import sharding as shr


def ssi_loss(pred_disp, target_depth, valid=None, grad_weight=0.5):
    """Scale-shift-invariant disparity loss with gradient matching."""
    target_disp = 1.0 / jnp.maximum(target_depth, 1e-3)
    w = jnp.ones_like(target_disp) if valid is None else valid

    def norm(d):
        mu = jnp.sum(d * w, axis=(-2, -1), keepdims=True) / (
            jnp.sum(w, axis=(-2, -1), keepdims=True) + 1e-6)
        s = jnp.sum(jnp.abs(d - mu) * w, axis=(-2, -1), keepdims=True) / (
            jnp.sum(w, axis=(-2, -1), keepdims=True) + 1e-6)
        return (d - mu) / (s + 1e-6)

    p = norm(pred_disp)
    t = norm(target_disp)
    data_term = jnp.sum(jnp.abs(p - t) * w) / (jnp.sum(w) + 1e-6)

    def grads(d):
        return (jnp.abs(jnp.diff(d, axis=-1)).mean()
                + jnp.abs(jnp.diff(d, axis=-2)).mean())

    return data_term + grad_weight * grads(p - t)


def make_optimizer(lr=1e-4, weight_decay=0.01):
    return optax.adamw(lr, weight_decay=weight_decay)


def make_train_step(model_apply, optimizer):
    """Returns train_step(params, opt_state, images, depth) -> (params,
    opt_state, loss). Pure; jit/shard outside."""

    def loss_fn(params, images, depth):
        pred = model_apply(params, images)
        return ssi_loss(pred, depth)

    def train_step(params, opt_state, images, depth):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, depth)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def jit_sharded_train_step(mesh, model_apply, optimizer, params_example):
    """Compile the train step with explicit DP/TP shardings over ``mesh``."""
    pspec = shr.params_shardings(mesh, params_example)
    bspec = shr.batch_sharding(mesh, 4)
    dspec = shr.batch_sharding(mesh, 3)
    rspec = shr.replicated(mesh)
    step = make_train_step(model_apply, optimizer)
    # optimizer state mirrors param sharding leaf-for-leaf where shaped
    opt_spec = jax.tree.map(
        lambda _: rspec, optimizer.init(jax.eval_shape(lambda: params_example)),
        is_leaf=lambda x: hasattr(x, "shape"))
    return jax.jit(
        step,
        in_shardings=(pspec, opt_spec, bspec, dspec),
        out_shardings=(pspec, opt_spec, rspec),
        donate_argnums=(0, 1),
    )
