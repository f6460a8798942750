from .point_fusion import PointFusion, bilinear_sample, point_sample

__all__ = ['PointFusion', 'bilinear_sample', 'point_sample']
