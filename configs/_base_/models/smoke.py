"""SMOKE model base (mirror of
/root/reference/configs/_base_/models/smoke.py)."""
model = dict(
    type='SMOKEDetector',
    backbone='dla',
    img_depth=34,
)
