"""Pillar variant without velocity heads (reference ..._novelo.py)."""
_base_ = ['./centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_nus.py']
model = dict(
    with_velocity=False,
    code_weights=[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
)
data = dict(with_velocity=False)
