"""Torch-checkpoint importer round-trip (VERDICT r4 item 4): random-init
reference torch PointPillar and (sparse) SECOND stacks -> flat state_dict
with reference names -> `utils/torch_import.import_state_dict` -> FULL-model
forward parity against the torch oracles. Also pins the spconv weight-layout
detection (dense / spconv 1.x / spconv 2.x), the analog of the reference's
version-migration transposition (`detector3d_template.py:330-359`).
"""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, str(Path(__file__).parent))
import ref_oracle

ref_oracle.install()

from pdm_ssd_tpu.utils.torch_import import import_state_dict, spconv_w
from pdm_ssd_tpu.models import build_network, get_host_prepare


def _sd_of(module, prefix):
    return {f'{prefix}.{k}': v.detach().numpy()
            for k, v in module.state_dict().items()}


def _heads_sd(heads):
    sd = {}
    for nm, cv in zip(('conv_cls', 'conv_box', 'conv_dir_cls'), heads):
        sd[f'dense_head.{nm}.weight'] = cv.weight.detach().numpy()
        sd[f'dense_head.{nm}.bias'] = cv.bias.detach().numpy()
    return sd


def _assert_clean(report):
    leftovers = [n for n, _ in report['unmatched']
                 if 'num_batches_tracked' not in n]
    assert not leftovers, leftovers


def test_pointpillar_state_dict_roundtrip(rng):
    from test_full_model_parity import (build_torch_modules, make_fixed_batch,
                                        jax_cfg, ds_cfg)
    vfe, scatter, bev, heads = build_torch_modules()
    sd = {**_sd_of(vfe, 'vfe'), **_sd_of(bev, 'backbone_2d'),
          **_heads_sd(heads)}

    vox, coords, nump = make_fixed_batch(rng)
    B, V = vox.shape[:2]
    tvox = torch.from_numpy(vox.reshape(-1, *vox.shape[2:]))
    tco = torch.from_numpy(np.concatenate(
        [np.repeat(np.arange(B), V)[:, None], coords.reshape(-1, 3)],
        axis=1).astype(np.float32))
    tnum = torch.from_numpy(nump.reshape(-1).astype(np.float32))
    with torch.no_grad():
        bd = {'voxels': tvox, 'voxel_coords': tco,
              'voxel_num_points': tnum, 'batch_size': B}
        bd = bev(scatter(vfe(bd)))
        feat_t = bd['spatial_features_2d']
        t_cls = heads[0](feat_t).permute(0, 2, 3, 1).numpy()
        t_box = heads[1](feat_t).permute(0, 2, 3, 1).numpy()
        t_dir = heads[2](feat_t).permute(0, 2, 3, 1).numpy()

    model = build_network(jax_cfg(), num_class=1, dataset_cfg=ds_cfg(),
                          class_names=['Car'])
    batch = {'voxels': jnp.asarray(vox), 'voxel_coords': jnp.asarray(coords),
             'voxel_num_points': jnp.asarray(nump),
             'voxel_mask': jnp.asarray(nump > 0)}
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    variables, report = import_state_dict(sd, variables)
    _assert_clean(report)
    assert len(report['loaded']) >= 20

    out = model.apply(variables, batch, training=False)
    np.testing.assert_allclose(np.asarray(out['anchor_cls_preds_map']),
                               t_cls, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out['anchor_box_preds_map']),
                               t_box, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out['anchor_dir_preds_map']),
                               t_dir, rtol=1e-3, atol=1e-3)


def test_second_sparse_state_dict_roundtrip(rng):
    from test_spconv_parity import (build_torch_stack, make_batch, jax_cfg,
                                    ds_cfg)
    vfe, bb, hc, bev, heads = build_torch_stack(rng)
    sd = {**_sd_of(bb, 'backbone_3d'), **_sd_of(bev, 'backbone_2d'),
          **_heads_sd(heads)}

    vox, coords, nump, vmask = make_batch(rng)
    B, V = coords.shape[:2]
    flat_vox, flat_coords, flat_num = [], [], []
    for b in range(B):
        n = int(vmask[b].sum())
        flat_vox.append(vox[b, :n])
        flat_num.append(nump[b, :n])
        flat_coords.append(np.concatenate(
            [np.full((n, 1), b), coords[b, :n]], 1))
    tdict = {'voxels': torch.tensor(np.concatenate(flat_vox)),
             'voxel_num_points': torch.tensor(np.concatenate(flat_num)),
             'voxel_coords': torch.tensor(
                 np.concatenate(flat_coords).astype(np.int32)),
             'batch_size': B}
    with torch.no_grad():
        bev_out = bev(hc(bb(vfe(tdict))))['spatial_features_2d']
        t_cls = heads[0](bev_out).permute(0, 2, 3, 1).numpy()
        t_box = heads[1](bev_out).permute(0, 2, 3, 1).numpy()
        t_dir = heads[2](bev_out).permute(0, 2, 3, 1).numpy()

    cfg, ds = jax_cfg(), ds_cfg()
    model = build_network(cfg, num_class=1, dataset_cfg=ds,
                          class_names=['Car'])
    batch = {'voxels': vox, 'voxel_coords': coords,
             'voxel_num_points': nump, 'voxel_mask': vmask}
    batch = get_host_prepare(cfg, ds)(batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    variables, report = import_state_dict(sd, variables)
    _assert_clean(report)

    out = model.apply(variables, batch, training=False)
    np.testing.assert_allclose(np.asarray(out['anchor_cls_preds_map']),
                               t_cls, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out['anchor_box_preds_map']),
                               t_box, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out['anchor_dir_preds_map']),
                               t_dir, rtol=2e-3, atol=2e-3)


def test_spconv_layout_detection(rng):
    """The three spconv weight layouts all land on the same gather-matmul
    kernel (dense is the shim layout; 1.x/2.x are the native checkpoint
    layouts the reference migrates between)."""
    c_in, c_out = 16, 32
    w_dense = rng.randn(c_out, c_in, 3, 3, 3).astype(np.float32)
    tgt = (27 * c_in, c_out)
    k_dense = spconv_w(w_dense, tgt)
    w_1x = np.transpose(w_dense, (2, 3, 4, 1, 0))      # (kz, ky, kx, in, out)
    np.testing.assert_array_equal(spconv_w(w_1x, tgt), k_dense)
    w_2x = np.transpose(w_dense, (0, 2, 3, 4, 1))      # (out, kz, ky, kx, in)
    np.testing.assert_array_equal(spconv_w(w_2x, tgt), k_dense)
    # flipped taps (inverse convs): tap t of the flipped kernel equals tap
    # K-1-t of the straight one
    k_flip = spconv_w(w_dense, tgt, flipped=True)
    a = k_dense.reshape(27, c_in, c_out)
    b = k_flip.reshape(27, c_in, c_out)
    np.testing.assert_array_equal(b, a[::-1])


def test_imported_ckpt_saves_and_overlays(rng, tmp_path):
    """The CLI plumbing (`tools/import_torch_ckpt.py`): imported variables
    save as a step-0 Orbax checkpoint that `trainer.load_pretrained`
    (train.py --pretrained_model) and restore_checkpoint (test.py --ckpt)
    both consume."""
    from test_full_model_parity import (build_torch_modules, make_fixed_batch,
                                        jax_cfg, ds_cfg)
    from pdm_ssd_tpu.runtime import trainer
    from pdm_ssd_tpu.utils.config import CfgNode

    vfe, scatter, bev, heads = build_torch_modules()
    sd = {**_sd_of(vfe, 'vfe'), **_sd_of(bev, 'backbone_2d'),
          **_heads_sd(heads)}
    vox, coords, nump = make_fixed_batch(rng)
    model = build_network(jax_cfg(), num_class=1, dataset_cfg=ds_cfg(),
                          class_names=['Car'])
    batch = {'voxels': jnp.asarray(vox), 'voxel_coords': jnp.asarray(coords),
             'voxel_num_points': jnp.asarray(nump),
             'voxel_mask': jnp.asarray(nump > 0)}
    opt = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 1e-3,
                   'WEIGHT_DECAY': 0.01, 'MOMENTUM': 0.9,
                   'MOMS': [0.95, 0.85], 'PCT_START': 0.4, 'DIV_FACTOR': 10,
                   'GRAD_NORM_CLIP': 10})
    state, tx, _ = trainer.create_train_state(model, batch, opt, 2, 1)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    variables, report = import_state_dict(sd, variables)
    _assert_clean(report)
    state = state.replace(params=variables['params'],
                          batch_stats=variables['batch_stats'])
    mgr = trainer.make_checkpoint_manager(str(tmp_path / 'ckpt'))
    trainer.save_checkpoint(mgr, state, 0)

    # fresh state -> pretrained overlay must recover the imported kernel
    fresh, _, _ = trainer.create_train_state(model, batch, opt, 2, 1, seed=7)
    loaded = trainer.load_pretrained(fresh, tmp_path / 'ckpt')
    want = np.asarray(jax.tree_util.tree_leaves(variables['params'])[0])
    got = np.asarray(jax.tree_util.tree_leaves(loaded.params)[0])
    np.testing.assert_array_equal(got, want)


def test_swin_state_dict_roundtrip(rng):
    """Reference SwinTransformer (4-stage-capable mmdet port in
    `backbones_image/swin.py`) -> state_dict -> importer -> pyramid parity,
    covering qkv/proj/rel-bias/FFN/LayerNorm transposition, the PatchMerging
    unfold-vs-spatial channel-order permutation, and the per-output norms."""
    import ref_oracle
    mod = ref_oracle.load('pcdet.models.backbones_image.swin')
    ED = ref_oracle._EasyDict
    depths, heads = [1, 1, 2], [1, 2, 4]
    tcfg = ED({'EMBED_DIMS': 8, 'DEPTHS': depths, 'NUM_HEADS': heads,
               'WINDOW_SIZE': 4, 'PATCH_SIZE': 4, 'MLP_RATIO': 4,
               'DROP_RATE': 0.0, 'ATTN_DROP_RATE': 0.0,
               'DROP_PATH_RATE': 0.0, 'OUT_INDICES': [1, 2]})
    tnet = mod.SwinTransformer(model_cfg=tcfg)
    with torch.no_grad():
        for nm, p in tnet.named_parameters():
            if 'relative_position_bias_table' in nm:
                p.copy_(torch.randn_like(p) * 0.2)
            elif nm.endswith('.bias'):
                p.add_(torch.randn_like(p) * 0.02)
    tnet.eval()

    imgs = rng.rand(1, 2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tnet({'camera_imgs': torch.from_numpy(
            imgs.transpose(0, 1, 4, 2, 3))})['image_features']
    t_out = [o.numpy() for o in t_out]                  # (BN, C, h, w)

    from pdm_ssd_tpu.models.backbones_image import SwinTransformer
    from pdm_ssd_tpu.utils.config import CfgNode
    jnet = SwinTransformer(model_cfg=CfgNode({
        'EMBED_DIM': 8, 'DEPTHS': depths, 'NUM_HEADS': heads,
        'WINDOW_SIZE': 4, 'PATCH_SIZE': 4, 'RETURN_PYRAMID': True,
        'OUT_INDICES': [1, 2], 'OUT_NORM': True}))
    jimgs = jnp.asarray(imgs)
    variables = jnet.init(jax.random.PRNGKey(0), jimgs)
    sd = _sd_of(tnet, 'image_backbone')
    variables, report = import_state_dict(sd, variables)
    leftovers = [n for n, _ in report['unmatched']
                 if 'relative_position_index' not in n]
    assert not leftovers, leftovers

    j_out = jnet.apply(variables, jimgs)
    for jo, to in zip(j_out, t_out):
        jo = np.moveaxis(np.asarray(jo).reshape(-1, *jo.shape[2:]), -1, 1)
        np.testing.assert_allclose(jo, to, rtol=2e-4, atol=2e-4)
