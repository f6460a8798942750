from .pointnet2_head import PointNet2SegHead

__all__ = ['PointNet2SegHead']
