"""Dataset registry + dataloader builder.

Parity with `pcdet/datasets/__init__.py:18-83`. The host-side loader reuses
torch's CPU DataLoader purely for worker-process prefetching (the reference's
own loader); batches are plain numpy dicts that the train loop `device_put`s
with the proper NamedSharding (DistributedSampler is unnecessary — data
parallelism shards the global batch over the mesh instead).
"""
from __future__ import annotations

from functools import partial

import numpy as np

from .dataset import DatasetTemplate
from .kitti.kitti_dataset import KittiDataset
from .custom.custom_dataset import CustomDataset
from .nuscenes.nuscenes_dataset import NuScenesDataset
from .waymo.waymo_dataset import WaymoDataset
from .once.once_dataset import ONCEDataset
from .lyft.lyft_dataset import LyftDataset
from .pandaset.pandaset_dataset import PandasetDataset
from .argo2.argo2_dataset import Argo2Dataset

__all__ = {
    'DatasetTemplate': DatasetTemplate,
    'KittiDataset': KittiDataset,
    'CustomDataset': CustomDataset,
    'NuScenesDataset': NuScenesDataset,
    'WaymoDataset': WaymoDataset,
    'ONCEDataset': ONCEDataset,
    'LyftDataset': LyftDataset,
    'PandasetDataset': PandasetDataset,
    'Argo2Dataset': Argo2Dataset,
}


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False, root_path=None,
                     workers=4, seed=None, logger=None, training=True,
                     merge_all_iters_to_one_epoch=False, total_epochs=0):
    dataset = __all__[dataset_cfg.DATASET](
        dataset_cfg=dataset_cfg, class_names=class_names,
        root_path=root_path, training=training, logger=logger)

    if merge_all_iters_to_one_epoch:
        dataset.dataset_cfg['MERGE_ALL_ITERS_TO_ONE_EPOCH'] = True
        dataset.total_epochs = total_epochs

    import torch.utils.data as torch_data

    def _worker_init_fn(worker_id, seed=None):
        if seed is not None:
            np.random.seed(seed + worker_id)

    dataloader = torch_data.DataLoader(
        dataset, batch_size=batch_size, pin_memory=False, num_workers=workers,
        shuffle=training, collate_fn=dataset.collate_batch, drop_last=training,
        timeout=0,
        worker_init_fn=partial(_worker_init_fn, seed=seed) if seed is not None else None,
    )
    return dataset, dataloader, None
