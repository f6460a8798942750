"""GroupFree3D width-2x backbone + 12 decoder layers (reference
groupfree3d_8x4_scannet-3d-18class-w2x-L12-O256.py)."""
_base_ = ['./groupfree3d_8x4_scannet-3d-18class-L6-O256.py']
model = dict(
    sa_channels=[[128, 128, 256], [256, 256, 512], [256, 256, 512],
                 [256, 256, 512]],
    fp_channels=[[512, 512], [512, 288]],
    head=dict(num_decoder_layers=12),
)
