"""ImVoteNet stage-2 SUN RGB-D (mirror of /root/reference/configs/
imvotenet/imvotenet_stage2_16x8_sunrgbd-3d-10class.py: VoteNet towers
over fused point+image-vote features, loss weights 0.8/0.1/0.1; 2D
boxes come from the frozen image branch — provided boxes here)."""
_base_ = [
    '../_base_/datasets/sunrgbd-3d-10class.py',
    '../_base_/schedules/schedule_3x.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='ImVoteNet',
    num_sampled_seed=1024,
    fusion=dict(num_classes=10, max_imvote_per_pixel=3),
    loss_weights=[0.8, 0.1, 0.1],
)
