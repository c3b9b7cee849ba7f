"""Full-forward torch-oracle parity for the spconv (voxel) family — the
SECOND stack (VERDICT r3 item 3): the reference's own `MeanVFE` ->
`VoxelBackBone8x` -> `HeightCompression` -> `BaseBEVBackbone` ->
`AnchorHeadSingle` convs, run on CPU through the pure-torch dense spconv
emulation (`ref_spconv_shim`), against the JAX SECOND assembly with ported
weights — activation parity at EVERY stage (x_conv1..4 slot tables, the
height-compressed BEV map, the 2D backbone output, and the head's cls/box/
dir conv maps). This converts the sparse ladder's dense-oracle self-tests
into reference parity. Reference:
`pcdet/models/backbones_3d/spconv_backbone.py:70-180`,
`vfe/mean_vfe.py:6-31`, `map_to_bev/height_compression.py:10-26`,
`backbones_2d/base_bev_backbone.py:6-112`,
`dense_heads/anchor_head_single.py`.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip('torch')

import ref_oracle
import ref_spconv_shim

ref_oracle.install()
ref_spconv_shim.install()

from pdm_ssd_tpu.utils.config import CfgNode
from pdm_ssd_tpu.models import build_network, get_host_prepare


BEV = {'LAYER_NUMS': [2], 'LAYER_STRIDES': [1], 'NUM_FILTERS': [64],
       'UPSAMPLE_STRIDES': [1], 'NUM_UPSAMPLE_FILTERS': [64]}


def jax_cfg():
    return CfgNode({
        'NAME': 'SECONDNet',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'SparseVoxelBackBone8x',
                        'NUM_FILTERS': [16, 32, 64, 64],
                        'OUT_FEATURES': 128,
                        # strided convs dilate the active set up to 8x; caps
                        # must hold ALL sites for exact torch parity
                        'ACTIVE_CAPS': [256, 2048, 2048, 2048, 1024]},
        'BACKBONE_2D': dict({'NAME': 'BaseBEVBackbone'}, **BEV),
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
            'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'TARGET_ASSIGNER_CONFIG': {'NAME': 'AxisAlignedTargetAssigner',
                                       'FEATURE_MAP_STRIDE': 8,
                                       'MATCH_HEIGHT': False,
                                       'BOX_CODER': 'ResidualCoder'},
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57],
                 'anchor_bottom_heights': [-1.78],
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45}],
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.1, 'OUTPUT_RAW_SCORE': False,
            'MAX_OBJ_PER_SAMPLE': 50,
            'NMS_CONFIG': {'MULTI_CLASSES_NMS': False,
                           'NMS_TYPE': 'nms_gpu', 'NMS_THRESH': 0.7,
                           'NMS_PRE_MAXSIZE': 512, 'NMS_POST_MAXSIZE': 50},
            'RECALL_THRESH_LIST': [0.3, 0.5, 0.7]},
    })


def ds_cfg():
    # 64 x 64 x 24 grid: z ladder 25 -> 13 -> 7 -> 3 -> 1
    return CfgNode({
        'POINT_CLOUD_RANGE': [0, -16, -3, 32, 16, 1],
        'NUM_POINT_FEATURES': 4,
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.5, 0.5, 0.16666667],
             'MAX_POINTS_PER_VOXEL': 5,
             'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}},
        ],
    })


def t2j(t):
    return t.detach().numpy()


def subm_w(conv):
    """torch dense-conv layout (out, in, kz, ky, kx) -> JAX gather-matmul
    kernel (K*in, out) with the tap order of `ops/sparse_maps._subm_map`
    (z outer, x inner)."""
    w = conv.weight.detach().permute(2, 3, 4, 1, 0)          # (kz,ky,kx,in,out)
    K = w.shape[0] * w.shape[1] * w.shape[2]
    return w.reshape(K * w.shape[3], w.shape[4]).numpy()


def bn_port(bn):
    return ({'scale': t2j(bn.weight), 'bias': t2j(bn.bias)},
            {'mean': t2j(bn.running_mean), 'var': t2j(bn.running_var)})


def randomize_bn(bn, rng):
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.weight.shape),
                                     dtype=torch.float32))
        bn.bias.copy_(torch.tensor(rng.uniform(-0.3, 0.3, bn.bias.shape),
                                   dtype=torch.float32))
        bn.running_mean.copy_(torch.tensor(
            rng.uniform(-0.2, 0.2, bn.running_mean.shape),
            dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(
            rng.uniform(0.5, 2.0, bn.running_var.shape),
            dtype=torch.float32))


def build_torch_stack(rng):
    ED = ref_oracle._EasyDict
    mean_vfe_mod = ref_oracle.load('pcdet.models.backbones_3d.vfe.mean_vfe')
    bb_mod = ref_oracle.load('pcdet.models.backbones_3d.spconv_backbone')
    hc_mod = ref_oracle.load(
        'pcdet.models.backbones_2d.map_to_bev.height_compression')
    bev_mod = ref_oracle.load('pcdet.models.backbones_2d.base_bev_backbone')

    torch.manual_seed(0)
    vfe = mean_vfe_mod.MeanVFE(model_cfg=ED({}), num_point_features=4)
    bb = bb_mod.VoxelBackBone8x(model_cfg=ED({}), input_channels=4,
                                grid_size=np.array([64, 64, 24]))
    hc = hc_mod.HeightCompression(model_cfg=ED({'NUM_BEV_FEATURES': 128}))
    bev = bev_mod.BaseBEVBackbone(model_cfg=ED(BEV), input_channels=128)
    for m in bb.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            randomize_bn(m, rng)
    for m in bev.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            randomize_bn(m, rng)
    na, nc, code, ndir = 2, 1, 7, 2
    conv_cls = torch.nn.Conv2d(bev.num_bev_features, na * nc, 1)
    conv_box = torch.nn.Conv2d(bev.num_bev_features, na * code, 1)
    conv_dir = torch.nn.Conv2d(bev.num_bev_features, na * ndir, 1)
    for m in (vfe, bb, hc, bev, conv_cls, conv_box, conv_dir):
        m.eval()
    return vfe, bb, hc, bev, (conv_cls, conv_box, conv_dir)


def torch_conv_bn_pairs(bb):
    """(jax_layer_name, conv, bn) for every layer of the reference
    VoxelBackBone8x in the JAX backbone's naming."""
    pairs = [('conv_input', bb.conv_input[0], bb.conv_input[1]),
             ('conv1_subm0', bb.conv1[0][0], bb.conv1[0][1])]
    for s, seq in ((2, bb.conv2), (3, bb.conv3), (4, bb.conv4)):
        pairs.append((f'down{s}', seq[0][0], seq[0][1]))
        pairs.append((f'conv{s}_subm0', seq[1][0], seq[1][1]))
        pairs.append((f'conv{s}_subm1', seq[2][0], seq[2][1]))
    pairs.append(('conv_out', bb.conv_out[0], bb.conv_out[1]))
    return pairs


def make_batch(rng, B=2, V=200):
    """Random active voxels with per-voxel point bundles on the fine grid."""
    vox = np.zeros((B, V, 5, 4), np.float32)
    coords = np.zeros((B, V, 3), np.int32)
    nump = np.zeros((B, V), np.int32)
    vmask = np.zeros((B, V), bool)
    D, H, W = 25, 64, 64
    for b in range(B):
        n = V - 10 * b
        flat = rng.choice((D - 1) * H * W, n, replace=False)
        c = np.stack([flat // (H * W), (flat // W) % H, flat % W], -1)
        coords[b, :n] = c
        nump[b, :n] = rng.randint(1, 6, n)
        for v in range(n):
            k = nump[b, v]
            vox[b, v, :k] = rng.randn(k, 4).astype(np.float32)
        vmask[b, :n] = True
    return vox, coords, nump, vmask


def row_lookup(t_idx, t_feat):
    """{(b, z, y, x): feature row} for a torch sparse tensor."""
    idx = t_idx.numpy()
    return {tuple(int(x) for x in idx[i]): t_feat[i]
            for i in range(len(idx))}


def test_second_spconv_stack_full_forward_parity(rng):
    vfe, bb, hc, bev, heads = build_torch_stack(rng)
    vox, coords, nump, vmask = make_batch(rng)
    B, V = coords.shape[:2]

    # ---- torch forward (flat rows, reference layout)
    flat_vox, flat_coords, flat_num = [], [], []
    for b in range(B):
        n = int(vmask[b].sum())
        flat_vox.append(vox[b, :n])
        flat_num.append(nump[b, :n])
        bc = np.concatenate([np.full((n, 1), b), coords[b, :n]], 1)
        flat_coords.append(bc)
    tdict = {
        'voxels': torch.tensor(np.concatenate(flat_vox)),
        'voxel_num_points': torch.tensor(np.concatenate(flat_num)),
        'voxel_coords': torch.tensor(
            np.concatenate(flat_coords).astype(np.int32)),
        'batch_size': B,
    }
    with torch.no_grad():
        tdict = vfe(tdict)
        tdict = bb(tdict)
        tdict = hc(tdict)
        sf = tdict['spatial_features']                       # (B, C*D, H, W)
        bev_out = bev({'spatial_features': sf})['spatial_features_2d']
        conv_cls, conv_box, conv_dir = heads
        t_cls = conv_cls(bev_out).permute(0, 2, 3, 1).numpy()
        t_box = conv_box(bev_out).permute(0, 2, 3, 1).numpy()
        t_dir = conv_dir(bev_out).permute(0, 2, 3, 1).numpy()

    # ---- JAX forward with ported weights
    cfg, ds = jax_cfg(), ds_cfg()
    model = build_network(cfg, num_class=1, dataset_cfg=ds,
                          class_names=['Car'])
    batch = {'voxels': vox, 'voxel_coords': coords, 'voxel_num_points': nump,
             'voxel_mask': vmask}
    prepare = get_host_prepare(cfg, ds)
    batch = prepare(batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])

    def find_key(tree, member):
        hits = [k for k, v in tree.items()
                if isinstance(v, dict) and member in v]
        assert len(hits) == 1, (member, list(tree))
        return hits[0]

    bb_key = find_key(params, 'conv_input')
    for name, conv, bn in torch_conv_bn_pairs(bb):
        params[bb_key][name]['kernel'] = subm_w(conv)
        p, s = bn_port(bn)
        params[bb_key][name]['MaskedBatchNorm_0'] = p
        stats[bb_key][name]['MaskedBatchNorm_0'] = s
    bev_key = find_key(params, 'down0_conv0')
    convs = [m for m in bev.blocks[0] if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in bev.blocks[0] if isinstance(m, torch.nn.BatchNorm2d)]
    for k, (cv, bn) in enumerate(zip(convs, bns)):
        params[bev_key][f'down0_conv{k}']['kernel'] = t2j(
            cv.weight.permute(2, 3, 1, 0))
        p, s = bn_port(bn)
        params[bev_key][f'down0_bn{k}'] = p
        stats[bev_key][f'down0_bn{k}'] = s
    de = bev.deblocks[0]
    # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out),
    # spatially flipped (flax conv_transpose does not flip the kernel)
    params[bev_key]['up0_deconv']['kernel'] = t2j(
        de[0].weight.permute(2, 3, 0, 1).flip(0, 1))
    p, s = bn_port(de[1])
    params[bev_key]['up0_bn'] = p
    stats[bev_key]['up0_bn'] = s
    hkey = find_key(params, 'conv_cls')
    for nm, cv in (('conv_cls', heads[0]), ('conv_box', heads[1]),
                   ('conv_dir_cls', heads[2])):
        params[hkey][nm] = {'kernel': t2j(cv.weight.permute(2, 3, 1, 0)),
                            'bias': t2j(cv.bias)}

    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params),
                 'batch_stats': jax.tree_util.tree_map(jnp.asarray, stats)}
    out = model.apply(variables, batch, training=False)

    # ---- per-stage slot-table parity (x_conv1..4)
    ms = out['multi_scale_3d_features_sparse']
    for s in (1, 2, 3, 4):
        x, co, mask = (np.asarray(ms[f'x_conv{s}'][0]),
                       np.asarray(ms[f'x_conv{s}'][1]),
                       np.asarray(ms[f'x_conv{s}'][2]))
        ref_rows = row_lookup(tdict['multi_scale_3d_features'][f'x_conv{s}']
                              .indices,
                              tdict['multi_scale_3d_features'][f'x_conv{s}']
                              .features.numpy())
        checked = 0
        for b in range(B):
            for v in range(co.shape[1]):
                if not mask[b, v]:
                    continue
                key = (b, int(co[b, v, 0]), int(co[b, v, 1]),
                       int(co[b, v, 2]))
                assert key in ref_rows, (s, key)
                np.testing.assert_allclose(x[b, v], ref_rows[key],
                                           rtol=1e-4, atol=1e-4,
                                           err_msg=f'x_conv{s} {key}')
                checked += 1
        assert checked == len(ref_rows), (s, checked, len(ref_rows))

    # ---- height-compressed BEV parity: torch (B, C, D, H, W).view(C*D)
    # vs JAX (B, H, W, D*C)
    C, Dz = 128, 1
    t_sf = sf.numpy().reshape(B, C, Dz, sf.shape[2], sf.shape[3])
    j_sf = np.asarray(out['spatial_features']).reshape(
        B, sf.shape[2], sf.shape[3], Dz, C)
    np.testing.assert_allclose(
        j_sf.transpose(0, 4, 3, 1, 2), t_sf, rtol=1e-4, atol=1e-4,
        err_msg='spatial_features')

    # ---- 2D backbone + head conv maps
    np.testing.assert_allclose(
        np.asarray(out['spatial_features_2d']),
        bev_out.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4,
        err_msg='spatial_features_2d')
    np.testing.assert_allclose(np.asarray(out['anchor_cls_preds_map']),
                               t_cls, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out['anchor_box_preds_map']), t_box, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out['anchor_dir_preds_map']), t_dir, rtol=1e-4, atol=1e-4)


def torch_res_pairs(bb):
    """(jax_name, conv, bn, fold_bias) for VoxelResBackBone8x: basic-block
    convs carry biases (bias=norm_fn is not None), folded into the ported
    BN running mean (BN(x+b) == BN' with mean' = mean - b)."""
    pairs = [('conv_input', bb.conv_input[0], bb.conv_input[1])]
    for i in (0, 1):
        blk = bb.conv1[i]
        pairs.append((f'conv1_block{i}.SparseConvBNReLU_0', blk.conv1,
                      blk.bn1))
        pairs.append((f'conv1_block{i}.SparseConvBNReLU_1', blk.conv2,
                      blk.bn2))
    for s, seq in ((2, bb.conv2), (3, bb.conv3), (4, bb.conv4)):
        pairs.append((f'down{s}', seq[0][0], seq[0][1]))
        for i in (1, 2):
            blk = seq[i]
            pairs.append((f'conv{s}_block{i-1}.SparseConvBNReLU_0',
                          blk.conv1, blk.bn1))
            pairs.append((f'conv{s}_block{i-1}.SparseConvBNReLU_1',
                          blk.conv2, blk.bn2))
    pairs.append(('conv_out', bb.conv_out[0], bb.conv_out[1]))
    return pairs


def test_second_res_spconv_backbone_parity(rng):
    """VoxelResBackBone8x (residual ladder, stage-4 width 128) activation
    parity through HeightCompression — `spconv_backbone.py:184-270`."""
    ED = ref_oracle._EasyDict
    bb_mod = ref_oracle.load('pcdet.models.backbones_3d.spconv_backbone')
    torch.manual_seed(1)
    bb = bb_mod.VoxelResBackBone8x(model_cfg=ED({}), input_channels=4,
                                   grid_size=np.array([64, 64, 24]))
    for m in bb.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            randomize_bn(m, rng)
    bb.eval()

    vox, coords, nump, vmask = make_batch(rng)
    B, V = coords.shape[:2]
    flat_coords = []
    mean_feats = []
    for b in range(B):
        n = int(vmask[b].sum())
        m = (vox[b, :n].sum(1) /
             np.maximum(nump[b, :n, None], 1)).astype(np.float32)
        mean_feats.append(m)
        flat_coords.append(np.concatenate(
            [np.full((n, 1), b), coords[b, :n]], 1))
    tdict = {
        'voxel_features': torch.tensor(np.concatenate(mean_feats)),
        'voxel_coords': torch.tensor(
            np.concatenate(flat_coords).astype(np.int32)),
        'batch_size': B,
    }
    with torch.no_grad():
        tdict = bb(tdict)
    t_out = tdict['encoded_spconv_tensor']

    cfg, ds = jax_cfg(), ds_cfg()
    cfg['NAME'] = 'SECONDNet'
    cfg['BACKBONE_3D']['NAME'] = 'SparseVoxelResBackBone8x'
    cfg['BACKBONE_3D']['NUM_FILTERS'] = [16, 32, 64, 128]
    model = build_network(cfg, num_class=1, dataset_cfg=ds,
                          class_names=['Car'])
    batch = {'voxels': vox, 'voxel_coords': coords, 'voxel_num_points': nump,
             'voxel_mask': vmask}
    prepare = get_host_prepare(cfg, ds)
    batch = {k: jnp.asarray(v) for k, v in prepare(batch).items()}
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])

    def find_key(tree, member):
        hits = [k for k, v in tree.items()
                if isinstance(v, dict) and member in v]
        assert len(hits) == 1, (member, list(tree))
        return hits[0]

    bb_key = find_key(params, 'conv_input')
    for name, conv, bn in torch_res_pairs(bb):
        parts = name.split('.')
        tp, ts = params[bb_key], stats[bb_key]
        for p_ in parts[:-1]:
            tp, ts = tp[p_], ts[p_]
        leaf = parts[-1]
        tp[leaf]['kernel'] = subm_w(conv)
        p, s = bn_port(bn)
        if conv.bias is not None:
            s = dict(s)
            s['mean'] = s['mean'] - conv.bias.detach().numpy()
        tp[leaf]['MaskedBatchNorm_0'] = p
        ts[leaf]['MaskedBatchNorm_0'] = s

    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params),
                 'batch_stats': jax.tree_util.tree_map(jnp.asarray, stats)}
    out = model.apply(variables, batch, training=False)

    ms = out['multi_scale_3d_features_sparse']
    ref_ms = tdict['multi_scale_3d_features']
    for s in (1, 2, 3, 4):
        x, co, mask = (np.asarray(ms[f'x_conv{s}'][0]),
                       np.asarray(ms[f'x_conv{s}'][1]),
                       np.asarray(ms[f'x_conv{s}'][2]))
        ref_rows = row_lookup(ref_ms[f'x_conv{s}'].indices,
                              ref_ms[f'x_conv{s}'].features.numpy())
        checked = 0
        for b in range(B):
            for v in range(co.shape[1]):
                if not mask[b, v]:
                    continue
                key = (b, int(co[b, v, 0]), int(co[b, v, 1]),
                       int(co[b, v, 2]))
                np.testing.assert_allclose(x[b, v], ref_rows[key],
                                           rtol=2e-4, atol=2e-4,
                                           err_msg=f'res x_conv{s} {key}')
                checked += 1
        assert checked == len(ref_rows), (s, checked, len(ref_rows))

    # final out-actives parity (stride-8, z-compressed input to BEV)
    xo, coo, mo = (np.asarray(out['encoded_sparse_out'][0]),
                   np.asarray(out['encoded_sparse_out'][1]),
                   np.asarray(out['encoded_sparse_out'][2]))
    ref_rows = row_lookup(t_out.indices, t_out.features.numpy())
    for b in range(B):
        for v in range(coo.shape[1]):
            if mo[b, v]:
                key = (b, int(coo[b, v, 0]), int(coo[b, v, 1]),
                       int(coo[b, v, 2]))
                np.testing.assert_allclose(xo[b, v], ref_rows[key],
                                           rtol=2e-4, atol=2e-4,
                                           err_msg=f'conv_out {key}')


def subm_w_flipped(conv):
    """Tap-REVERSED port for inverse convs: the shim's SparseInverseConv3d
    is the exact adjoint (applies W[t] to the (coarse i, tap t) pair),
    while the JAX decoder consumes the flip-stored `invert_down_map`
    (applies its kernel at K-1-t) — so W_jax[K-1-t] = W_torch[t]."""
    w = conv.weight.detach().permute(2, 3, 4, 1, 0).flip(0, 1, 2)
    K = w.shape[0] * w.shape[1] * w.shape[2]
    return w.reshape(K * w.shape[3], w.shape[4]).numpy()


def test_unet_v2_decoder_torch_parity(rng):
    """The reference's own UNetV2 (Part-A2 backbone, `spconv_unet.py:49-230`)
    through the dense spconv emulation vs the JAX SparseUNetV2: encoder
    stages, conv_out, AND the UR decoder (lateral SparseBasicBlock,
    merge-down conv, channel reduction, inverse convs through the
    transposed rulebook) — per-voxel `point_features` parity at the
    stage-1 slots."""
    ED = ref_oracle._EasyDict
    un_mod = ref_oracle.load('pcdet.models.backbones_3d.spconv_unet')
    torch.manual_seed(5)
    net = un_mod.UNetV2(model_cfg=ED({'RETURN_ENCODED_TENSOR': True}),
                        input_channels=4, grid_size=np.array([64, 64, 24]),
                        voxel_size=[0.5, 0.5, 0.16666667],
                        point_cloud_range=[0, -16, -3, 32, 16, 1])
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            randomize_bn(m, rng)
    net.eval()

    vox, coords, nump, vmask = make_batch(rng)
    B, V = coords.shape[:2]
    mean_feats, flat_coords = [], []
    for b in range(B):
        n = int(vmask[b].sum())
        mean_feats.append((vox[b, :n].sum(1) /
                           np.maximum(nump[b, :n, None], 1)).astype(np.float32))
        flat_coords.append(np.concatenate(
            [np.full((n, 1), b), coords[b, :n]], 1))
    with torch.no_grad():
        tdict = net({'voxel_features': torch.tensor(np.concatenate(mean_feats)),
                     'voxel_coords': torch.tensor(
                         np.concatenate(flat_coords).astype(np.int32)),
                     'batch_size': B})
    t_pf = tdict['point_features'].numpy()
    t_pc = tdict['point_coords'].numpy()

    # ---- JAX standalone SparseUNetV2 with ported weights
    from pdm_ssd_tpu.models.backbones_3d.sparse_backbone import SparseUNetV2
    from pdm_ssd_tpu.ops import sparse_maps as sm
    caps = [256, 2048, 2048, 2048, 1024]
    maps = sm.batch_build_backbone8x(coords, vmask, (64, 64, 24), caps,
                                     want_upmaps=True)
    vfeat = (vox.sum(2) / np.maximum(nump[..., None], 1)).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in maps.items()}
    batch['voxel_features'] = jnp.asarray(vfeat)
    jnet = SparseUNetV2(model_cfg=CfgNode({'NUM_FILTERS': [16, 32, 64, 64],
                                           'OUT_FEATURES': 128}),
                        input_channels=4, grid_size=(64, 64, 24),
                        voxel_size=(0.5, 0.5, 0.16666667),
                        point_cloud_range=(0, -16, -3, 32, 16, 1))
    variables = jnet.init({'params': jax.random.PRNGKey(0)}, dict(batch),
                          training=False)
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])

    def port(leaf_path, conv, bn, flipped=False):
        tp, ts = params, stats
        parts = leaf_path.split('.')
        for p_ in parts[:-1]:
            tp, ts = tp[p_], ts[p_]
        leaf = parts[-1]
        tp[leaf]['kernel'] = subm_w_flipped(conv) if flipped else subm_w(conv)
        p, s = bn_port(bn)
        if conv.bias is not None:
            s = dict(s)
            s['mean'] = s['mean'] - conv.bias.detach().numpy()
        tp[leaf]['MaskedBatchNorm_0'] = p
        ts[leaf]['MaskedBatchNorm_0'] = s

    port('conv_input', net.conv_input[0], net.conv_input[1])
    port('conv1_subm0', net.conv1[0][0], net.conv1[0][1])
    for s_, seq in ((2, net.conv2), (3, net.conv3), (4, net.conv4)):
        port(f'down{s_}', seq[0][0], seq[0][1])
        port(f'conv{s_}_subm0', seq[1][0], seq[1][1])
        port(f'conv{s_}_subm1', seq[2][0], seq[2][1])
    port('conv_out', net.conv_out[0], net.conv_out[1])
    for s_, t_blk, m_blk, inv_blk, inv_flip in (
            (4, net.conv_up_t4, net.conv_up_m4, net.inv_conv4, True),
            (3, net.conv_up_t3, net.conv_up_m3, net.inv_conv3, True),
            (2, net.conv_up_t2, net.conv_up_m2, net.inv_conv2, True),
            (1, net.conv_up_t1, net.conv_up_m1, net.conv5[0], False)):
        port(f'up{s_}_t.SparseConvBNReLU_0', t_blk.conv1, t_blk.bn1)
        port(f'up{s_}_t.SparseConvBNReLU_1', t_blk.conv2, t_blk.bn2)
        port(f'up{s_}_m', m_blk[0], m_blk[1])
        port(f'up{s_}_inv', inv_blk[0], inv_blk[1], flipped=inv_flip)

    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params),
                 'batch_stats': jax.tree_util.tree_map(jnp.asarray, stats)}
    out = jnet.apply(variables, dict(batch), training=False)

    j_pf = np.asarray(out['point_features'])
    j_pc = np.asarray(out['point_coords'])
    j_m = np.asarray(out['point_mask'])
    ref_rows = {}
    for i in range(len(t_pf)):
        key = (int(t_pc[i, 0]), round(float(t_pc[i, 1]), 4),
               round(float(t_pc[i, 2]), 4), round(float(t_pc[i, 3]), 4))
        ref_rows[key] = t_pf[i]
    checked = 0
    for b in range(B):
        for v in range(j_pf.shape[1]):
            if not j_m[b, v]:
                continue
            key = (b, round(float(j_pc[b, v, 0]), 4),
                   round(float(j_pc[b, v, 1]), 4),
                   round(float(j_pc[b, v, 2]), 4))
            assert key in ref_rows, key
            np.testing.assert_allclose(j_pf[b, v], ref_rows[key],
                                       rtol=2e-4, atol=2e-4, err_msg=str(key))
            checked += 1
    assert checked == len(ref_rows)


def test_second_spconv_stack_train_loss_parity(rng):
    """TRAIN-mode composition parity for the SECOND stack: the reference's
    own forward (train-mode BN batch stats) + AxisAlignedTargetAssigner +
    sigmoid-focal / sin-difference smooth-L1 / direction losses vs the JAX
    `forward_with_loss` with ported weights on the same batch + GT — loss
    components match. MATCH_HEIGHT=False keeps the torch assigner CUDA-free
    (`axis_aligned_target_assigner.py:141`)."""
    vfe, bb, hc, bev, heads = build_torch_stack(rng)
    ED = ref_oracle._EasyDict
    ah_mod = ref_oracle.load('pcdet.models.dense_heads.anchor_head_single')
    cfg, ds = jax_cfg(), ds_cfg()
    torch.manual_seed(2)
    head_cfg = dict(cfg['DENSE_HEAD'])
    # the reference reads the stride from each anchor-generator entry and
    # wants the full assigner keys (OpenPCDet yaml defaults)
    head_cfg['ANCHOR_GENERATOR_CONFIG'] = [
        dict(c, feature_map_stride=8)
        for c in head_cfg['ANCHOR_GENERATOR_CONFIG']]
    head_cfg['TARGET_ASSIGNER_CONFIG'] = dict(
        head_cfg['TARGET_ASSIGNER_CONFIG'],
        POS_FRACTION=-1.0, SAMPLE_SIZE=512, NORM_BY_NUM_EXAMPLES=False)
    head = ah_mod.AnchorHeadSingle(
        model_cfg=ED(head_cfg), input_channels=64,
        num_class=1, class_names=['Car'], grid_size=np.array([64, 64, 24]),
        point_cloud_range=np.array([0, -16, -3, 32, 16, 1], np.float32),
        predict_boxes_when_training=False)
    for m in (vfe, bb, hc, bev, head):
        m.train()

    vox, coords, nump, vmask = make_batch(rng)
    B, V = coords.shape[:2]
    gt = np.zeros((B, 5, 8), np.float32)
    gt[:, :, 0] = rng.uniform(5, 28, (B, 5))
    gt[:, :, 1] = rng.uniform(-12, 12, (B, 5))
    gt[:, :, 2] = -1.0
    gt[:, :, 3:6] = [3.9, 1.6, 1.56]
    gt[:, :, 6] = rng.uniform(-np.pi, np.pi, (B, 5))
    gt[:, :, 7] = 1

    flat_vox, flat_coords, flat_num = [], [], []
    for b in range(B):
        n = int(vmask[b].sum())
        flat_vox.append(vox[b, :n])
        flat_num.append(nump[b, :n])
        flat_coords.append(np.concatenate([np.full((n, 1), b),
                                           coords[b, :n]], 1))
    tdict = {
        'voxels': torch.tensor(np.concatenate(flat_vox)),
        'voxel_num_points': torch.tensor(np.concatenate(flat_num)),
        'voxel_coords': torch.tensor(
            np.concatenate(flat_coords).astype(np.int32)),
        'batch_size': B,
        'gt_boxes': torch.tensor(gt),
    }
    with torch.no_grad():
        tdict = vfe(tdict)
        tdict = bb(tdict)
        tdict = hc(tdict)
        bev_out = bev({'spatial_features': tdict['spatial_features']})
        tdict['spatial_features_2d'] = bev_out['spatial_features_2d']
        tdict = head(tdict)
        t_loss, t_tb = head.get_loss()

    model = build_network(cfg, num_class=1, dataset_cfg=ds,
                          class_names=['Car'])
    batch = {'voxels': vox, 'voxel_coords': coords, 'voxel_num_points': nump,
             'voxel_mask': vmask, 'gt_boxes': gt,
             'gt_mask': np.ones((B, 5), bool)}
    prepare = get_host_prepare(cfg, ds)
    batch = {k: jnp.asarray(v) for k, v in prepare(batch).items()}
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])

    def find_key(tree, member):
        hits = [k for k, v in tree.items()
                if isinstance(v, dict) and member in v]
        assert len(hits) == 1, (member, list(tree))
        return hits[0]

    bb_key = find_key(params, 'conv_input')
    for name, conv, bn in torch_conv_bn_pairs(bb):
        params[bb_key][name]['kernel'] = subm_w(conv)
        p, s = bn_port(bn)
        params[bb_key][name]['MaskedBatchNorm_0'] = p
        stats[bb_key][name]['MaskedBatchNorm_0'] = s
    bev_key = find_key(params, 'down0_conv0')
    convs = [m for m in bev.blocks[0] if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in bev.blocks[0] if isinstance(m, torch.nn.BatchNorm2d)]
    for k, (cv, bn) in enumerate(zip(convs, bns)):
        params[bev_key][f'down0_conv{k}']['kernel'] = t2j(
            cv.weight.permute(2, 3, 1, 0))
        p, s = bn_port(bn)
        params[bev_key][f'down0_bn{k}'] = p
        stats[bev_key][f'down0_bn{k}'] = s
    de = bev.deblocks[0]
    params[bev_key]['up0_deconv']['kernel'] = t2j(
        de[0].weight.permute(2, 3, 0, 1).flip(0, 1))
    p, s = bn_port(de[1])
    params[bev_key]['up0_bn'] = p
    stats[bev_key]['up0_bn'] = s
    hkey = find_key(params, 'conv_cls')
    for nm, cv in (('conv_cls', head.conv_cls), ('conv_box', head.conv_box),
                   ('conv_dir_cls', head.conv_dir_cls)):
        params[hkey][nm] = {'kernel': t2j(cv.weight.permute(2, 3, 1, 0)),
                            'bias': t2j(cv.bias)}

    variables = {'params': jax.tree_util.tree_map(jnp.asarray, params),
                 'batch_stats': jax.tree_util.tree_map(jnp.asarray, stats)}
    (loss, tb), _ = model.apply(variables, batch, training=True,
                                mutable=['batch_stats'],
                                method=model.forward_with_loss)

    np.testing.assert_allclose(float(tb['anchor_cls_loss']),
                               float(t_tb['rpn_loss_cls']), rtol=1e-3)
    np.testing.assert_allclose(float(tb['anchor_loc_loss']),
                               float(t_tb['rpn_loss_loc']), rtol=1e-3)
    np.testing.assert_allclose(float(tb['anchor_dir_loss']),
                               float(t_tb['rpn_loss_dir']), rtol=1e-3)
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-3)
