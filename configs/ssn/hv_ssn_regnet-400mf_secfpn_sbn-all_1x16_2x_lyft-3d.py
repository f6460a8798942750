"""SSN with a NoStemRegNet-400MF backbone on Lyft (mirror of
/root/reference/configs/ssn/
hv_ssn_regnet-400mf_secfpn_sbn-all_1x16_2x_lyft-3d.py)."""
_base_ = ['./hv_ssn_secfpn_sbn-all_2x16_2x_lyft-3d.py']
model = dict(backbone='regnetx_400mf')
