"""Stage-3 matching config (mirror of
/root/reference/configs/gga/gga_kitti_matching_config.py:93 — identical
to the weak-training config except the dataset behavior: inference runs
over the full trainval split and the evaluate hook performs image-IoU
pseudo-label matching + dumps the pseudo info pkl).

Consumed by tools/generate_pseudo_labels_gga.py.
"""
_base_ = './gga_kitti.py'

matching = dict(
    # info file to run inference + matching over (relative to data_root)
    info='kitti_infos_trainval_GGA.pkl',
    # where the matched pseudo infos land (reference:
    # data/kitti_pesudo/kitti_infos_trainval_GGA_pseudo.pkl [sic])
    out='data/kitti_pseudo/kitti_infos_trainval_GGA_pseudo.pkl',
)
