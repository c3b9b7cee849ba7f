"""Data-parallel training on the virtual 8-device CPU mesh: one full jitted
train step with sharded batch, verifying loss decreases and state updates."""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.models import build_network
from pdm_ssd_tpu.parallel import make_mesh, replicate, shard_batch
from pdm_ssd_tpu.runtime.trainer import (
    create_train_state, make_train_step, make_predict_step)

from test_model_forward import tiny_model_cfg, dataset_cfg, make_batch


def opt_cfg():
    return CfgNode({
        'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
        'MOMS': [0.95, 0.85], 'PCT_START': 0.4, 'DIV_FACTOR': 10,
        'GRAD_NORM_CLIP': 10,
    })


def test_data_parallel_train_step():
    n_dev = jax.device_count()
    assert n_dev == 8, f'expected 8 virtual devices, got {n_dev}'
    model = build_network(tiny_model_cfg(), num_class=3, dataset_cfg=dataset_cfg())
    rng = np.random.RandomState(0)
    batch = make_batch(rng, B=8, N=256, M=4)
    batch = {k: np.asarray(v) for k, v in batch.items()}

    state, tx, lr_sched = create_train_state(
        model, batch, opt_cfg(), total_iters_each_epoch=10, total_epochs=2)
    mesh = make_mesh()
    state = replicate(state, mesh)
    train_step = make_train_step(model, tx)

    losses = []
    for i in range(4):
        device_batch = shard_batch(batch, mesh)
        state, metrics = train_step(state, device_batch)
        losses.append(float(jax.device_get(metrics['loss'])))
    assert all(np.isfinite(losses))
    assert int(jax.device_get(state.step)) == 4
    # same batch repeatedly -> loss should drop
    assert losses[-1] < losses[0], losses

    predict = make_predict_step(model)
    dets = predict(state.params, state.batch_stats, shard_batch(batch, mesh))
    assert dets['pred_boxes'].shape[0] == 8
