from .base_bev_backbone import BaseBEVBackbone  # noqa: F401

__all__ = {
    'BaseBEVBackbone': BaseBEVBackbone,
}
