"""Flip TTA on the PDM-SSD predict path (the DOUBLE_FLIP analog)."""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.models import build_network
from pdm_ssd_tpu.utils.config import CfgNode, cfg_from_yaml_file


def test_tta_flip_merges_and_dedupes():
    cfg = cfg_from_yaml_file('configs/kitti_models/pdm_ssd.yaml', CfgNode())
    m = cfg.MODEL
    # tiny shapes for CPU
    m.BACKBONE_3D.CELL_SIZE = 1.6
    m.BACKBONE_3D.GRID_SIZE = [44, 50]
    m.BACKBONE_3D.NUM_FILTERS = [8, 8, 16]
    m.PDM_NECK.BEV_SIZE = [22, 25]
    m.PDM_NECK.VOXEL_SIZE = [3.2, 3.2, 1.0]
    m.PDM_NECK.NUM_BEV_FEATURES = 8
    m.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 64
    m.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16
    m.DENSE_HEAD.POST_PROCESSING.MAX_OBJ_PER_SAMPLE = 16
    m.POST_PROCESSING.TTA_FLIP = ['y']

    model = build_network(m, num_class=3, dataset_cfg=cfg.DATA_CONFIG)
    rng = np.random.RandomState(0)
    pts = np.stack([rng.uniform(0, 70.4, (1, 512)),
                    rng.uniform(-40, 40, (1, 512)),
                    rng.uniform(-3, 1, (1, 512)),
                    rng.rand(1, 512)], -1).astype(np.float32)
    batch = {'points': jnp.asarray(pts)}
    variables = model.init({'params': jax.random.PRNGKey(0)}, batch,
                           training=False)
    det = model.apply(variables, batch, method=model.predict)
    # merged output keeps the configured post size and stays finite
    assert det['pred_boxes'].shape == (1, 16, 7)
    assert np.isfinite(np.asarray(det['pred_boxes'])).all()

    # determinism: flipping the input cloud mirrors the detections
    fb = {'points': jnp.asarray(pts).at[..., 1].multiply(-1.0)}
    det2 = model.apply(variables, fb, method=model.predict)
    s1 = np.sort(np.asarray(det['pred_scores'])[0])
    s2 = np.sort(np.asarray(det2['pred_scores'])[0])
    np.testing.assert_allclose(s1, s2, atol=1e-4)
