"""VoteNet SUN RGB-D (mirror of
/root/reference/configs/votenet/votenet_16x8_sunrgbd-3d-10class.py; the
10-class mean sizes are VoteHeadConfig dataclass defaults)."""
_base_ = [
    '../_base_/models/votenet.py',
    '../_base_/datasets/sunrgbd-3d-10class.py',
    '../_base_/schedules/schedule_3x.py',
    '../_base_/default_runtime.py',
]
