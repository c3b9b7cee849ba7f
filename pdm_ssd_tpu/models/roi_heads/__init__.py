from .pointrcnn_head import PointRCNNHead  # noqa: F401
from .roi_head_template import RoIHeadTemplate  # noqa: F401

__all__ = {
    'PointRCNNHead': PointRCNNHead,
}
