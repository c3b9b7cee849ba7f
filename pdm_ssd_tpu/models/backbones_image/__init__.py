from .image_backbone import ConvImageBackbone  # noqa: F401
from .fuser import ConvFuser  # noqa: F401
from .swin import SwinTransformer  # noqa: F401
from .generalized_lss import GeneralizedLSSFPN, BasicBlock2D  # noqa: F401
