"""MonoFlex KITTI mono3d (the reference ships only configs/monoflex/
README.md+metafile; this mirrors the metafile's model: DLA-34 gn-all +
DLANeck + MonoFlexHead with edge fusion, Adam lr 1e-4ish schedule)."""
_base_ = [
    '../_base_/datasets/kitti-mono3d.py',
    '../_base_/default_runtime.py',
]
model = dict(
    type='MonoFlexDetector',
    img_depth=34,
    head=dict(num_classes=3, use_edge_fusion=True,
              edge_heatmap_ratio=0.125),
)
optimizer = dict(lr=0.0001, grad_clip=35.0,
                 lr_policy='step', lr_steps=(50,), lr_gamma=0.1)
data = dict(samples_per_gpu=4)
max_epochs = 72
