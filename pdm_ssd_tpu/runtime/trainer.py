"""Jitted train/eval steps + training loop.

Replaces the reference runner (`tools/train_utils/train_utils.py:11-254`):
the per-iter hot loop is ONE pjit-compiled function
`(state, batch) -> (state, metrics)` — forward, target assignment, losses,
backward, clip, optimizer update and BN-stat update all fused into a single
XLA program; gradient all-reduce over the `data` mesh axis is inserted by XLA
from the shardings (no DDP / GradScaler / autocast — bf16 matmuls are native).
Checkpointing is Orbax with the reference's rotation policy.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..parallel import make_mesh, replicate, shard_batch
from .optimization import build_optimizer_and_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def _filter_device_batch(batch: dict) -> dict:
    """Keep only the array entries the jitted step consumes.

    Ragged raw points (padded to the per-batch max, signalled by
    'points_mask') are dropped when the pipeline produced voxels: voxel
    models never read them, and their ever-changing pad length would force
    a full XLA recompile every iteration. Models that need raw points
    alongside voxels (PV-RCNN keypoints) must run a fixed-N `sample_points`
    step, which removes 'points_mask' and keeps the shape static."""
    keep = {'points', 'points_mask', 'gt_boxes', 'gt_mask',
            'voxels', 'voxel_coords', 'voxel_num_points', 'voxel_mask',
            'camera_imgs', 'trans_lidar_to_cam', 'trans_cam_to_img',
            'depth_maps', 'gt_boxes2d', 'gt_boxes2d_mask',
            # nuScenes camera branch (BEVFusion)
            'camera_depth', 'camera2lidar', 'camera_intrinsics',
            'lidar2image', 'img_aug_matrix', 'lidar_aug_matrix',
            # multi-frame sequence keys (Waymo SEQUENCE_CONFIG / MPPNet)
            'points_multi_frame', 'poses',
            'roi_boxes', 'roi_scores', 'roi_labels'}
    out = {k: v for k, v in batch.items()
           if k in keep or k.startswith('sp_') or k.startswith('fl_')}
    if 'voxels' in out and 'points_mask' in out:
        out.pop('points', None)
        out.pop('points_mask', None)
    return out


def create_train_state(model, batch, opt_cfg, total_iters_each_epoch, total_epochs,
                       seed=0):
    # jit the init: un-jitted tracing dispatches thousands of individual ops
    # (over the tunnel that is ~30 ms EACH — ~20 min of startup for the
    # sparse ladder); one compiled call also lands in the persistent cache
    init_fn = jax.jit(lambda key, b: model.init({'params': key}, b,
                                                training=False))
    variables = init_fn(jax.random.PRNGKey(seed), _filter_device_batch(batch))
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    tx, lr_sched = build_optimizer_and_schedule(
        params, opt_cfg, total_iters_each_epoch, total_epochs)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))
    return state, tx, lr_sched


def make_train_step(model, tx, seed: int = 0):
    """The per-step 'targets' rng stream (ROI fg/bg subsampling) is folded
    from the step counter so the stochastic target sampling differs every
    iteration (the reference relies on fresh torch randomness per step)."""
    base_key = jax.random.PRNGKey(seed)

    def train_step(state: TrainState, batch: dict):
        step_key = jax.random.fold_in(base_key, state.step)

        def loss_fn(params):
            (loss, tb), mutated = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, training=True, mutable=['batch_stats'],
                rngs={'targets': step_key},
                method=model.forward_with_loss)
            return loss, (tb, mutated['batch_stats'])

        (loss, (tb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt_state)
        metrics = {'loss': loss, **tb}
        return new_state, metrics
    return jax.jit(train_step, donate_argnums=(0,))


def make_predict_step(model):
    def predict_step(params, batch_stats, batch):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           batch, method=model.predict)
    return jax.jit(predict_step)


def train_model(model, state, tx, train_loader, total_epochs, rank0_logger=None,
                ckpt_manager=None, start_epoch=0, log_interval=50,
                tb_writer=None, lr_sched=None, hook_cfg=None, dataset=None,
                host_prepare=None):
    """Epoch loop (`train_utils.train_model:150-211` analog)."""
    from .hooks import apply_epoch_hooks
    mesh = make_mesh()
    state = replicate(state, mesh)
    train_step = make_train_step(model, tx)
    accumulated_iter = int(jax.device_get(state.step))

    for epoch in range(start_epoch, total_epochs):
        if dataset is not None:
            apply_epoch_hooks(hook_cfg, dataset, epoch, total_epochs,
                              logger=rank0_logger)
        t0 = time.time()
        from .prefetch import prefetch_batches
        for it, batch in enumerate(prefetch_batches(train_loader,
                                                    host_prepare)):
            device_batch = shard_batch(_filter_device_batch(batch), mesh)
            state, metrics = train_step(state, device_batch)
            accumulated_iter += 1
            if rank0_logger and (it % log_interval == 0):
                m = jax.device_get(metrics)
                lr = float(lr_sched(accumulated_iter)) if lr_sched else float('nan')
                rank0_logger.info(
                    'epoch %d iter %d/%d loss %.4f lr %.3e ' % (
                        epoch, it, len(train_loader), float(m['loss']), lr)
                    + ' '.join(f'{k}={float(v):.4f}' for k, v in m.items()
                               if k != 'loss'))
                if tb_writer is not None:
                    for k, v in m.items():
                        tb_writer.add_scalar(f'train/{k}', float(v), accumulated_iter)
                    tb_writer.add_scalar('meta_data/learning_rate', lr, accumulated_iter)
        if rank0_logger:
            rank0_logger.info('epoch %d done in %.1fs' % (epoch, time.time() - t0))
        if ckpt_manager is not None:
            save_checkpoint(ckpt_manager, state, epoch + 1)
    return state


def save_checkpoint(ckpt_manager, state, epoch):
    """Orbax save with the reference's `{epoch, model_state, optimizer_state}`
    content (`train_utils.checkpoint_state:221-254`)."""
    host_state = jax.device_get(state)
    ckpt_manager.save(epoch, args=_ocp_args(host_state))
    ckpt_manager.wait_until_finished()


def _ocp_args(host_state):
    import orbax.checkpoint as ocp
    return ocp.args.StandardSave({
        'step': host_state.step,
        'params': host_state.params,
        'batch_stats': host_state.batch_stats,
        'opt_state': host_state.opt_state,
    })


def make_checkpoint_manager(ckpt_dir, max_to_keep=5):
    import orbax.checkpoint as ocp
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(ckpt_dir, options=options)


def restore_checkpoint(ckpt_manager, state, step=None):
    """Auto-resume from the newest checkpoint (`train.py:146-158` analog).
    Returns (state, start_epoch)."""
    import orbax.checkpoint as ocp
    step = step if step is not None else ckpt_manager.latest_step()
    if step is None:
        return state, 0
    host_state = jax.device_get(state)
    target = {
        'step': host_state.step, 'params': host_state.params,
        'batch_stats': host_state.batch_stats, 'opt_state': host_state.opt_state,
    }
    restored = ckpt_manager.restore(step, args=ocp.args.StandardRestore(target))
    state = state.replace(
        step=jnp.asarray(restored['step']), params=restored['params'],
        batch_stats=restored['batch_stats'], opt_state=restored['opt_state'])
    return state, int(step)


def load_pretrained(state, ckpt_dir, step=None, logger=None):
    """Partial, shape-tolerant parameter overlay (distinct from resume):
    the analog of `--pretrained_model` + `_load_state_dict`
    (`detector3d_template.py:330-384`) — copies every checkpoint leaf whose
    path exists in the current model with a matching shape, keeps the rest
    initialized, and does NOT restore optimizer state or step."""
    import orbax.checkpoint as ocp
    mgr = make_checkpoint_manager(str(ckpt_dir))
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f'no checkpoint under {ckpt_dir}')
    restored = mgr.restore(step)
    src_params = restored.get('params', {})
    src_stats = restored.get('batch_stats', {})

    def overlay(dst, src, prefix=''):
        loaded, skipped = 0, 0
        flat_dst = jax.tree_util.tree_flatten_with_path(dst)[0]
        import jax.tree_util as jtu
        src_flat = {jtu.keystr(p): v for p, v in
                    jtu.tree_flatten_with_path(src)[0]}
        out = {}
        new_leaves = {}
        for path, leaf in flat_dst:
            key = jtu.keystr(path)
            cand = src_flat.get(key)
            if cand is not None and np.asarray(cand).shape == np.asarray(leaf).shape:
                new_leaves[key] = jnp.asarray(cand, leaf.dtype)
                loaded += 1
            else:
                new_leaves[key] = leaf
                skipped += 1
        treedef = jax.tree_util.tree_structure(dst)
        ordered = [new_leaves[jtu.keystr(p)] for p, _ in flat_dst]
        if logger:
            logger.info(f'pretrained{prefix}: loaded {loaded} leaves, kept {skipped}')
        return jax.tree_util.tree_unflatten(treedef, ordered)

    params = overlay(jax.device_get(state.params), src_params, '/params')
    stats = overlay(jax.device_get(state.batch_stats), src_stats, '/batch_stats')
    return state.replace(params=params, batch_stats=stats)
