"""SMOKE model base (mirror of
/root/reference/configs/_base_/models/smoke.py)."""
model = dict(
    type='SMOKEDetector',
    img_depth=34,
    neck_channels=64,
)
