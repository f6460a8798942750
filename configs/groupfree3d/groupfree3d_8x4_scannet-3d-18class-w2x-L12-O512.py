"""GroupFree3D w2x + L12 + 512 object proposals (reference
groupfree3d_8x4_scannet-3d-18class-w2x-L12-O512.py)."""
_base_ = ['./groupfree3d_8x4_scannet-3d-18class-w2x-L12-O256.py']
model = dict(head=dict(num_proposal=512))
