"""Detector registry (`pcdet/models/detectors/__init__.py:19-38` analog).

`PDMSSD` is the specialized flagship; `PointPillar`, `SECONDNet` and
`CenterPoint` assemble from the generic `Detector3D` template by config —
the reference's module-topology pattern as pure configuration.
"""
from .detector3d import Detector3D
from .pdm_ssd import PDMSSD
from .point_rcnn import PointRCNN
from .pv_rcnn import PVRCNN
from .voxel_rcnn import VoxelRCNN
from .parta2 import PartA2Net
from .second_iou import SECONDNetIoU
from .bev_fusion import BevFusion
from .pv_rcnn_plusplus import PVRCNNPlusPlus
from .caddn import CaDDN
from .mppnet import MPPNet


def build_detector(model_cfg, num_class, dataset_cfg, class_names=None):
    name = model_cfg.NAME
    if name == 'PDMSSD':
        return PDMSSD(model_cfg=model_cfg, num_class=num_class,
                      dataset_cfg=dataset_cfg, class_names=class_names)
    if name == 'PointRCNN':
        return PointRCNN(model_cfg=model_cfg, num_class=num_class,
                         dataset_cfg=dataset_cfg)
    if name == 'PVRCNN':
        return PVRCNN(model_cfg=model_cfg, num_class=num_class,
                      dataset_cfg=dataset_cfg, class_names=class_names)
    if name == 'VoxelRCNN':
        return VoxelRCNN(model_cfg=model_cfg, num_class=num_class,
                         dataset_cfg=dataset_cfg, class_names=class_names)
    if name == 'PartA2Net':
        return PartA2Net(model_cfg=model_cfg, num_class=num_class,
                         dataset_cfg=dataset_cfg, class_names=class_names)
    if name == 'SECONDNetIoU':
        return SECONDNetIoU(model_cfg=model_cfg, num_class=num_class,
                            dataset_cfg=dataset_cfg, class_names=class_names)
    if name == 'BevFusion':
        return BevFusion(model_cfg=model_cfg, num_class=num_class,
                         dataset_cfg=dataset_cfg, class_names=class_names)
    if name == 'PVRCNNPlusPlus':
        return PVRCNNPlusPlus(model_cfg=model_cfg, num_class=num_class,
                              dataset_cfg=dataset_cfg, class_names=class_names)
    if name == 'CaDDN':
        return CaDDN(model_cfg=model_cfg, num_class=num_class,
                     dataset_cfg=dataset_cfg, class_names=class_names)
    if name in ('MPPNet', 'MPPNetE2E'):
        return MPPNet(model_cfg=model_cfg, num_class=num_class,
                      dataset_cfg=dataset_cfg, class_names=class_names)
    if name in ('PointPillar', 'SECONDNet', 'CenterPoint', 'PillarNet',
                'VoxelNeXt', 'DSVT', 'TransFusion', 'Detector3D'):
        return Detector3D(model_cfg=model_cfg, num_class=num_class,
                          dataset_cfg=dataset_cfg, class_names=class_names)
    raise KeyError(f'unknown detector: {name}')
