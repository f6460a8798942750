"""Geometry core: boxes, rotations, projections, IoU, NMS, heatmaps."""
from . import boxes, gaussian, geometry, nms, np_geometry, rotated_iou

__all__ = ['boxes', 'gaussian', 'geometry', 'nms', 'np_geometry',
           'rotated_iou']
