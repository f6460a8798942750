"""DCN-substitute + circle-NMS + double-flip TTA (reference
..._dcn_circlenms_4x8_cyclic_flip-tta_20e_nus)."""
_base_ = ['./centerpoint_0075voxel_second_secfpn_dcn_circlenms_4x8_cyclic_20e_nus.py']
tta = dict(flip=True, scales=[1.0])
