"""Hook system + pretrained-overlay behaviors."""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.runtime.hooks import apply_epoch_hooks
from pdm_ssd_tpu.runtime import trainer


class FakeAugmentor:
    def __init__(self):
        self.disabled_with = None

    def disable_augmentation(self, cfg):
        self.disabled_with = list(cfg['DISABLE_AUG_LIST'])


class FakeDataset:
    def __init__(self):
        self.data_augmentor = FakeAugmentor()
        self.dataset_cfg = CfgNode({'DATA_AUGMENTOR': {
            'DISABLE_AUG_LIST': ['placeholder'],
            'AUG_CONFIG_LIST': []}})


def test_disable_augmentation_hook_fires_only_in_last_epochs():
    hook_cfg = CfgNode({'DisableAugmentationHook': {
        'DISABLE_AUG_LIST': ['gt_sampling'], 'NUM_LAST_EPOCHS': 2}})
    ds = FakeDataset()
    apply_epoch_hooks(hook_cfg, ds, cur_epoch=5, total_epochs=10)
    assert ds.data_augmentor.disabled_with is None
    apply_epoch_hooks(hook_cfg, ds, cur_epoch=8, total_epochs=10)
    assert ds.data_augmentor.disabled_with == ['gt_sampling']


def test_pretrained_overlay_partial(tmp_path, rng):
    """Matching leaves load, mismatched shapes are kept from the init."""
    from test_model_forward import tiny_model_cfg, dataset_cfg, make_batch
    from pdm_ssd_tpu.models import build_network

    model = build_network(tiny_model_cfg(), num_class=3, dataset_cfg=dataset_cfg())
    batch = make_batch(rng)
    state, tx, _ = trainer.create_train_state(
        model, trainer._filter_device_batch(batch),
        CfgNode({'OPTIMIZER': 'adam', 'LR': 1e-3, 'WEIGHT_DECAY': 0.0,
                 'GRAD_NORM_CLIP': 10.0}), 2, 1)
    mgr = trainer.make_checkpoint_manager(str(tmp_path / 'ckpt'))
    trainer.save_checkpoint(mgr, state, 1)

    # fresh state with different seed: params differ until overlay
    state2, _, _ = trainer.create_train_state(
        model, trainer._filter_device_batch(batch),
        CfgNode({'OPTIMIZER': 'adam', 'LR': 1e-3, 'WEIGHT_DECAY': 0.0,
                 'GRAD_NORM_CLIP': 10.0}), 2, 1, seed=123)
    kernels1 = [l for l in jax.tree_util.tree_leaves(state.params) if l.ndim >= 2]
    kernels2 = [l for l in jax.tree_util.tree_leaves(state2.params) if l.ndim >= 2]
    assert not np.allclose(np.asarray(kernels1[0]), np.asarray(kernels2[0]))

    state3 = trainer.load_pretrained(state2, tmp_path / 'ckpt')
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # step/opt state untouched (no resume)
    assert int(jax.device_get(state3.step)) == 0
