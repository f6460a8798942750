"""VoteNet + axis-aligned IoU loss (reference
votenet_iouloss_8x8_scannet-3d-18class.py: AxisAlignedIoULoss on
positive proposals, weight 10/3)."""
_base_ = ['./votenet_8x8_scannet-3d-18class.py']
model = dict(head=dict(iou_loss_weight=3.3333333333333335))
