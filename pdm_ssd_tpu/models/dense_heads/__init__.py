from .center_head import CenterHead  # noqa: F401
from .point_head_box import PointHeadBox  # noqa: F401
from .point_head_simple import PointHeadSimple  # noqa: F401

__all__ = {
    'CenterHead': CenterHead,
    'PointHeadBox': PointHeadBox,
    'PointHeadSimple': PointHeadSimple,
}
