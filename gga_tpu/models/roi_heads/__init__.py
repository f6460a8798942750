from .part_aggregation import (RoIHeadConfig, assign_and_sample,
                               build_rcnn_targets, pool_roi_features)
from .parta2_bbox_head import (PartA2BboxConfig, PartA2BboxHead,
                               bbox_head_loss, corner_loss_lidar,
                               decode_refined)
from .semantic_head import (PointwiseSemanticHead, semantic_loss,
                            semantic_targets)

__all__ = ['RoIHeadConfig', 'assign_and_sample', 'pool_roi_features',
           'build_rcnn_targets', 'PartA2BboxConfig', 'PartA2BboxHead',
           'bbox_head_loss', 'corner_loss_lidar', 'decode_refined',
           'PointwiseSemanticHead', 'semantic_loss', 'semantic_targets']
