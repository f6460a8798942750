"""VoteNet model base (mirror of
/root/reference/configs/_base_/models/votenet.py: PointNet2SASSG
(2048,1024,512,256) + VoteHead)."""
model = dict(type='VoteNet')
