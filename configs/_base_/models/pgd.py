"""PGD model base (mirror of
/root/reference/configs/_base_/models/pgd.py: ResNet101 + FPN +
PGDHead; head geometry lives in PGDConfig dataclass defaults)."""
model = dict(
    type='PGDDetector',
    backbone_depth=101,
    fpn_channels=256,
    fpn_num_outs=4,
)
