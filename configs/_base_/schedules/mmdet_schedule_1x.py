"""mmdet 1x schedule (mirror of
/root/reference/configs/_base_/schedules/mmdet_schedule_1x.py):
SGD 0.02, momentum 0.9, wd 1e-4, linear warmup 500 iters, steps at
epoch 8/11 of 12."""
optimizer = dict(type='SGD', lr=0.02, momentum=0.9, weight_decay=1e-4)
lr_config = dict(policy='step', warmup='linear', warmup_iters=500,
                 warmup_ratio=0.001, step=[8, 11])
max_epochs = 12
