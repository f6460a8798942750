"""3DSSD model base (mirror of
/root/reference/configs/_base_/models/3dssd.py: SAMSG backbone with
(D-FPS, FS, F-FPS+D-FPS) sampling, vote module without residual
features, spec aggregation; knobs live as SSD3DNetConfig defaults)."""
model = dict(
    type='SSD3DNet',
    num_points=[4096, 512, [256, 256]],
    fps_mods=[['D-FPS'], ['FS'], ['F-FPS', 'D-FPS']],
    fps_sample_range_lists=[[-1], [-1], [512, -1]],
    head=dict(num_classes=1, num_candidates=256,
              vote_xyz_range=[3.0, 3.0, 2.0],
              pos_distance_thr=10.0, expand_dims_length=0.05),
)
