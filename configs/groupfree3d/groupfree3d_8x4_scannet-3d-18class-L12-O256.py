"""GroupFree3D with 12 decoder layers (reference
groupfree3d_8x4_scannet-3d-18class-L12-O256.py)."""
_base_ = ['./groupfree3d_8x4_scannet-3d-18class-L6-O256.py']
model = dict(head=dict(num_decoder_layers=12))
