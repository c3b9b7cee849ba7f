"""Model registry and builder (`pcdet/models/__init__.py:16-53` analog).

`build_network(model_cfg, num_class, dataset_cfg)` returns a flax Module; the
`load_data_to_gpu` host->device transfer of the reference is replaced by
`jax.device_put` of the collated numpy batch (handled by the train/eval loops).
"""
from .detectors import build_detector


def build_network(model_cfg, num_class, dataset_cfg, class_names=None):
    return build_detector(model_cfg=model_cfg, num_class=num_class,
                          dataset_cfg=dataset_cfg, class_names=class_names)
