"""Stage-4 PGD monocular retrain on the GGA pseudo labels.

Mirror of /root/reference/configs/gga/gga_pdg.py: KittiMonoDataset over
kitti_infos_trainval_GGA_pseudo (:115-130), SGD lr 1e-3 with 500-iter
linear warmup at ratio 1/3, step decay 0.1x at epochs (32, 44) of 48,
grad clip 35 (:155-168), batch 12/device (:107).

Consumed by tools/train_pgd.py. (The reference README spells the file
``gga_pgd.py`` but ships ``gga_pdg.py``; the on-disk name is kept.)
"""
_base_ = ['../_base_/models/pgd.py']

data = dict(
    samples_per_gpu=12,
    data_root='data/kitti/',
    info='data/kitti_pseudo/kitti_infos_trainval_GGA_pseudo.pkl',
    min_score=None,          # optional pseudo-label score filter
)

optimizer = dict(lr=0.001, momentum=0.9, weight_decay=0.0001,
                 grad_clip=35.0, lr_policy='step', lr_steps=(32, 44),
                 lr_gamma=0.1, warmup_iters=500, warmup_ratio=1.0 / 3)
max_epochs = 48
checkpoint_interval = 8
work_dir = './work_dirs/kitti_pgd_gga'
