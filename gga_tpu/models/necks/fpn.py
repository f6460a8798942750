"""FPN neck (NHWC).

Rebuild of mmdet FPN as configured by the reference's FCOS3D/PGD
(/root/reference/configs/_base_/models/fcos3d.py: start_level,
add_extra_convs='on_output', relu_before_extra_convs; gga_pdg.py overrides
start_level=0, num_outs=4).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers import conv_init


class FPN(nn.Module):
    out_channels: int = 256
    start_level: int = 0
    num_outs: int = 4
    relu_before_extra_convs: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = True):
        """feats: tuple of NHWC maps (increasing stride)."""
        feats = feats[self.start_level:]
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=conv_init,
                    name=f'lateral{i}')(f)
            for i, f in enumerate(feats)]

        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            up = jax.image.resize(laterals[i], laterals[i - 1].shape,
                                  method='nearest')
            laterals[i - 1] = laterals[i - 1] + up

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding='SAME',
                    kernel_init=conv_init, name=f'fpn{i}')(l)
            for i, l in enumerate(laterals)]

        # extra levels from the last output ('on_output')
        while len(outs) < self.num_outs:
            src = outs[-1]
            if self.relu_before_extra_convs:
                src = nn.relu(src)
            outs.append(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], kernel_init=conv_init,
                        name=f'fpn_extra{len(outs)}')(src))
        return tuple(outs[:self.num_outs])
