"""PAConv 'CUDA' variant (reference
paconv_cuda_ssg_8x8_cosine_200e_s3dis_seg-3d-13class.py): in the
reference this selects a fused CUDA scorenet kernel with identical
math; on TPU the XLA path already fuses the scorenet einsum, so the
model is the same as paconv_ssg — kept as a config alias for surface
parity (200-epoch schedule per the reference)."""
_base_ = ['./paconv_ssg_8x8_cosine_150e_s3dis_seg-3d-13class.py']
max_epochs = 200
