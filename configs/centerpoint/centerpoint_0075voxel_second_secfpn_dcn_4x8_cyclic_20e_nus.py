"""DCN substitute at 0.075 voxels — see the 01voxel dcn config's
docstring for the documented MXU delta (share_conv 128 matches the
DCNSeparateHead's capacity)."""
_base_ = ['./centerpoint_0075voxel_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(share_conv_channel=128)
