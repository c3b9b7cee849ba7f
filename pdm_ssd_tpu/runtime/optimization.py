"""Optimizer / LR-schedule builders on optax.

Functional parity with the reference fastai-port optimization stack
(`tools/train_utils/optimization/__init__.py:11-70`,
`learning_schedules_fastai.py:60-115`, `fastai_optim.py:104-230`):

- `adam_onecycle`: OneCycle LR (div_factor warmup -> cosine anneal to
  lr/1e4) with cyclical Adam beta1 (moms 0.95 <-> 0.85), true weight decay
  with BatchNorm/bias exclusion (the OptimWrapper `true_wd`/`bn_wd` behavior).
- `adam` / `sgd`: flat LR with step decay (`LambdaLR` + `DECAY_STEP_LIST`).
- Global-norm gradient clipping (`GRAD_NORM_CLIP`) is folded into the chain.
"""
from __future__ import annotations

import numpy as np
import optax


def _wd_mask(params):
    """Apply weight decay only to >=2D kernels (excludes BN scales and biases,
    mirroring OptimWrapper's bn/bias exclusion)."""
    import jax
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def onecycle_lr_schedule(lr, total_steps, pct_start=0.4, div_factor=10.0):
    """Fastai OneCycle (`learning_schedules_fastai.py:60-115`): cos-anneal
    lr/div_factor -> lr over pct_start, then lr -> lr/1e4."""
    warm = max(int(total_steps * pct_start), 1)
    return optax.join_schedules([
        _cos_ramp(lr / div_factor, lr, warm),
        _cos_ramp(lr, lr / 1e4, max(total_steps - warm, 1)),
    ], [warm])


def _cos_ramp(start, end, steps):
    def sched(count):
        import jax.numpy as jnp
        t = np.pi * jnp.minimum(count / steps, 1.0)
        cos_out = jnp.cos(t) + 1  # 2 -> 0
        return end + (start - end) / 2.0 * cos_out
    return sched


def onecycle_mom_schedule(total_steps, moms=(0.95, 0.85), pct_start=0.4):
    warm = max(int(total_steps * pct_start), 1)
    return optax.join_schedules([
        _cos_ramp(moms[0], moms[1], warm),
        _cos_ramp(moms[1], moms[0], max(total_steps - warm, 1)),
    ], [warm])


def step_decay_schedule(lr, decay_step_list, lr_decay, lr_clip, steps_per_epoch):
    """LambdaLR with epoch-based decay steps (`optimization/__init__.py:47-58`)."""
    boundaries = {}
    cur = lr
    for epoch in sorted(decay_step_list):
        cur = max(cur * lr_decay, lr_clip)
        boundaries[int(epoch * steps_per_epoch)] = cur / lr if lr > 0 else 1.0
    return optax.piecewise_constant_schedule(lr, boundaries)


def build_optimizer_and_schedule(params, opt_cfg, total_iters_each_epoch, total_epochs):
    """Returns (optax.GradientTransformation, lr_schedule_fn)."""
    total_steps = total_iters_each_epoch * total_epochs
    name = opt_cfg.OPTIMIZER
    wd = opt_cfg.get('WEIGHT_DECAY', 0.0)
    clip = opt_cfg.get('GRAD_NORM_CLIP', 10.0)

    if name == 'adam_onecycle':
        lr_sched = onecycle_lr_schedule(
            opt_cfg.LR, total_steps, pct_start=opt_cfg.get('PCT_START', 0.4),
            div_factor=opt_cfg.get('DIV_FACTOR', 10.0))
        mom_sched = onecycle_mom_schedule(
            total_steps, moms=tuple(opt_cfg.get('MOMS', [0.95, 0.85])),
            pct_start=opt_cfg.get('PCT_START', 0.4))
        opt = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.inject_hyperparams(
                lambda learning_rate, b1: optax.adamw(
                    learning_rate=learning_rate, b1=b1, weight_decay=wd,
                    mask=_wd_mask))(learning_rate=lr_sched, b1=mom_sched),
        )
        return opt, lr_sched
    elif name == 'adam':
        lr_sched = step_decay_schedule(
            opt_cfg.LR, opt_cfg.get('DECAY_STEP_LIST', [35, 45]),
            opt_cfg.get('LR_DECAY', 0.1), opt_cfg.get('LR_CLIP', 1e-7),
            total_iters_each_epoch)
        opt = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(learning_rate=lr_sched, weight_decay=wd, mask=_wd_mask))
        return opt, lr_sched
    elif name == 'sgd':
        lr_sched = step_decay_schedule(
            opt_cfg.LR, opt_cfg.get('DECAY_STEP_LIST', [35, 45]),
            opt_cfg.get('LR_DECAY', 0.1), opt_cfg.get('LR_CLIP', 1e-7),
            total_iters_each_epoch)
        # decay is added to the raw gradient BEFORE the lr scaling inside sgd,
        # so the applied update is -lr * (g + wd * p) (true decayed SGD).
        opt = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.add_decayed_weights(wd, mask=_wd_mask),
            optax.sgd(learning_rate=lr_sched, momentum=opt_cfg.get('MOMENTUM', 0.9)))
        return opt, lr_sched
    raise NotImplementedError(name)
