from .pointnet2_backbone import PointNet2MSG  # noqa: F401

__all__ = {
    'PointNet2MSG': PointNet2MSG,
}
