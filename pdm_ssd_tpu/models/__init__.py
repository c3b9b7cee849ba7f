"""Model registry and builder (`pcdet/models/__init__.py:16-53` analog).

`build_network(model_cfg, num_class, dataset_cfg)` returns a flax Module; the
`load_data_to_gpu` host->device transfer of the reference is replaced by
`jax.device_put` of the collated numpy batch (handled by the train/eval loops).
"""
from .detectors import build_detector


def build_network(model_cfg, num_class, dataset_cfg, class_names=None):
    return build_detector(model_cfg=model_cfg, num_class=num_class,
                          dataset_cfg=dataset_cfg, class_names=class_names)


_SPARSE_BB_NAMES = ('SparseVoxelBackBone8x', 'SparseVoxelResBackBone8x',
                    'SparseUNetV2')


def get_host_prepare(model_cfg, dataset_cfg, training=False):
    """Per-batch host preprocessing for models whose device graph consumes
    host-precomputed tables (the sparse ladder's kernel maps,
    `ops/sparse_maps.py`). Returns a numpy batch->batch callable or None.
    The train/eval loops apply it before `jax.device_put` — the TPU analog
    of spconv building its rulebooks outside the conv kernels.
    `training=True` additionally ships the transpose (inverse) maps that the
    gather-transpose backward consumes (`sparse_backbone.sparse_conv_mm`);
    eval skips them to keep the host floor minimal."""
    bb = model_cfg.get('BACKBONE_3D', None)
    if bb is None:
        return None
    if bb.get('NAME') == 'VoxelBackBone8xFocal':
        return _focal_prepare(bb, dataset_cfg)
    if bb.get('NAME') not in _SPARSE_BB_NAMES:
        return None
    import numpy as np
    from .detectors.detector3d import _grid_info
    from ..ops.sparse_maps import batch_build_backbone8x, default_caps
    grid, _ = _grid_info(dataset_cfg)
    caps_cfg = bb.get('ACTIVE_CAPS', None)
    # packed-window gathers need host-built overflow-correction lists
    qwin_cap = bb.get('QWIN_CORR_CAP', True) if bb.get('QWIN', False) \
        else None
    if isinstance(qwin_cap, dict):
        qwin_cap = dict(qwin_cap)
    pwin_cap = None
    if qwin_cap is None and bb.get('PWIN', False):
        pwin_cap = bb.get('PWIN_CORR_CAP', True)
        if isinstance(pwin_cap, dict):
            pwin_cap = dict(pwin_cap)

    want_bev = model_cfg.get('DENSE_HEAD', {}).get('NAME') == 'VoxelNeXtHead'

    # transpose maps: for the gather-transpose training backward, and (first
    # three) the UNet decoder's inverse-conv forward maps
    want_bwd = (training and bb.get('GATHER_BWD', True)
                and qwin_cap is None and pwin_cap is None)

    def prepare(batch):
        if 'sp_submap1' in batch:
            return batch
        V = batch['voxel_coords'].shape[1]
        caps = list(caps_cfg) if caps_cfg else default_caps(V)
        caps[0] = V        # stage-1 slot table is the input voxel table
        batch = dict(batch)
        # the UNet decoder consumes sp_upmap{2,3,4} as FORWARD maps, so its
        # eval batches need them too — the C builder inverts them in-pass
        # (cheaper than the numpy fallback inversion)
        want_up = want_bwd or bb.get('NAME') == 'SparseUNetV2'
        batch.update(batch_build_backbone8x(
            np.asarray(batch['voxel_coords']),
            np.asarray(batch['voxel_mask']), grid, caps,
            qwin_corr_cap=qwin_cap, pwin_corr_cap=pwin_cap,
            want_upmaps=want_up))
        if want_bev:
            from ..ops.sparse_maps import batch_build_bev, ladder_shapes
            bev_hw = ladder_shapes(grid)[4][1:]
            batch.update(batch_build_bev(batch['sp_coords_out'],
                                         batch['sp_mask_out'], bev_hw))
        if not want_bwd and 'sp_upmap_out' in batch:
            batch.pop('sp_upmap_out')     # eval: keep the gbwd gate off
        return batch
    return prepare


def _focal_prepare(bb, dataset_cfg):
    """Host focal-ladder builder (`ops/sparse_maps.build_focal_ladder_maps`).
    Capacities: BACKBONE_3D.ACTIVE_CAPS (5 candidate-site caps) and
    FOCAL_ECAPS (3 dilated-table caps); defaults scale with the voxel cap
    (dilated sets hold every slot any learned mask could activate)."""
    import numpy as np
    from .detectors.detector3d import _grid_info
    from ..ops.sparse_maps import batch_build_focal
    grid, _ = _grid_info(dataset_cfg)
    caps_cfg = bb.get('ACTIVE_CAPS', None)
    ecaps_cfg = bb.get('FOCAL_ECAPS', None)

    def prepare(batch):
        if 'fl_submap1' in batch:
            return batch
        V = batch['voxel_coords'].shape[1]
        caps = list(caps_cfg) if caps_cfg else [V, 2 * V, (3 * V) // 2, V, V]
        caps[0] = V
        ecaps = list(ecaps_cfg) if ecaps_cfg else [4 * c for c in caps[:3]]
        batch = dict(batch)
        batch.update(batch_build_focal(
            np.asarray(batch['voxel_coords']),
            np.asarray(batch['voxel_mask']), grid, caps, ecaps))
        return batch
    return prepare
