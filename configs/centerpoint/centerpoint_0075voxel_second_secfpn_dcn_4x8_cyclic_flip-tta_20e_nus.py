"""Double-flip TTA variant (reference ..._dcn_4x8_cyclic_flip-tta_20e_nus):
drives apis.inference_detector_aug (horizontal+vertical point flips,
merge_aug_bboxes_3d)."""
_base_ = ['./centerpoint_0075voxel_second_secfpn_dcn_4x8_cyclic_20e_nus.py']
tta = dict(flip=True, scales=[1.0])
