"""Middle encoders: sparse 3D encoder and pillar scatter.

TPU rebuilds of /root/reference/mmdet3d/models/middle_encoders/:
- SparseEncoder (sparse_encoder.py:19) on the gather-GEMM-scatter sparse
  engine; emits a dense NHWC BEV map.
- PointPillarsScatter (pillar_scatter.py:10) as a single XLA scatter.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import numpy as np

from ..ops import sparse as sp
from ..ops.scatter import pillar_scatter
from .layers import (MaskedBatchNorm, SparseBasicBlock, SparseConvBlock,
                     SubMConv3dMapped, conv_init)


class SparseEncoder(nn.Module):
    """SECOND's sparse middle encoder (basicblock variant of the GGA config,
    gga_kitti_config.py:11-19).

    Structure: SubM(in->16) then 4 stages; stages 1..3 end with a stride-2
    SparseConv3d; stage 4 keeps resolution; conv_out is SparseConv3d
    k=(3,1,1) s=(2,1,1). Output densified to [B, H, W, C*D] (NHWC).
    """
    in_channels: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    encoder_paddings: Sequence[Sequence] = (
        (0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0))
    block_type: str = 'basicblock'
    # static active-site budgets after each downsample stage
    stage_budgets: Sequence[int] = (16000, 16000, 16000)
    out_budget: int = 16000
    # also return per-stage sparse outputs (SASSD's encode_features,
    # sparse_encoder.py:292-295)
    return_stages: bool = False
    # rematerialize residual blocks in the backward pass: recomputes the
    # block's gathers instead of storing activations — trades ~fwd-time
    # for the memory that blocks B=16 (B=16 OOMs by 139 MB at B=8's
    # operating point, CLAUDE.md)
    remat_blocks: bool = False
    # run these stages' residual blocks on the dense-tile engine
    # (ops/tile_conv.py): per stage, actives are scattered once into
    # dense tiles and the SubM convs become halo-exchange + one MXU
    # conv — 27*N gather rows become 26*T tile-slab rows. Only pays
    # where actives CLUSTER (stage 0 has ~1.1 actives/tile on real
    # scenes — keep it on the row engine; stages 1-3 sit at 3-25,
    # tools/tile_occupancy.py). tile_budgets is indexed by stage and
    # must exceed the per-scene occupied-tile count or whole tiles
    # drop (occupancy_tile_stage* diagnostics guard this).
    tile_stages: Tuple[int, ...] = ()
    tile_shape: Tuple[int, int, int] = (2, 4, 4)
    tile_budgets: Tuple[int, ...] = (0, 7168, 3072, 1536)

    @nn.compact
    def __call__(self, feats, coords, valid, train: bool = True):
        """feats [B, V, C]; coords [B, V, 3] (z,y,x) sorted; valid [B, V].

        Returns:
            [B, H, W, C*D] dense BEV features (NHWC); if ``return_stages``,
            a tuple of (bev, [(feats, coords, valid, grid) per stage]).
        """
        grid = tuple(self.sparse_shape)

        def make_map(cc, vv):
            st = sp.SparseTensor(jnp.zeros((cc.shape[0], 1), jnp.float32),
                                 cc, vv, tuple(grid))
            return sp.build_subm_map(st)

        from ..ops import tile_conv as tc

        B = feats.shape[0]

        def make_stage_maps(stage_idx, x, c, v, g):
            """Neighbor structure for stage_idx's residual blocks; on a
            tile stage also converts x rows -> tiles. Returns
            (x, nmap, hit, blk_valid, tmf) where blk_valid is what the
            blocks' BatchNorm masks on (rows' valid or the cell mask)."""
            if stage_idx in self.tile_stages:
                tile = tuple(self.tile_shape)
                tb = int(self.tile_budgets[stage_idx])
                tm = jax.vmap(lambda cc, vv: tc.build_tile_map(
                    cc, vv, tuple(g), tile, tb))(c, v)
                tmf = tc.flatten_tile_map(tm)
                self.sow('diagnostics',
                         f'occupancy_tile_stage{stage_idx}',
                         tm.tvalid.sum(-1).astype(jnp.float32).mean()
                         / tb)
                xt = tc.rows_to_tiles(
                    x.reshape(B * x.shape[1], x.shape[-1]), tmf)
                return xt, tmf.tnmap, tmf.thit, tmf.cell_mask, tmf

            def mk(cc, vv):
                st = sp.SparseTensor(
                    jnp.zeros((cc.shape[0], 1), jnp.float32),
                    cc, vv, tuple(g))
                return sp.build_subm_map(st)
            nmap, hit = jax.vmap(mk)(c, v)
            return x, nmap, hit, v, None

        def to_rows(x, tmf, n):
            if tmf is None:
                return x
            r = tc.tiles_to_rows(x, tmf.rank, tmf.slot, tmf.kept)
            return r.reshape(B, n, r.shape[-1])

        # one neighbor map per active set, shared by every SubM conv on it
        nmap, hit = jax.vmap(make_map)(coords, valid)
        x = SubMConv3dMapped(self.base_channels)(feats, valid, nmap, hit)
        x = MaskedBatchNorm()(x, valid, train)
        x = nn.relu(x)
        c, v, g = coords, valid, grid
        if 0 in self.tile_stages:
            x, nmap, hit, blk_valid, tmf = make_stage_maps(0, x, c, v, g)
        else:
            blk_valid, tmf = v, None

        assert self.block_type in ('basicblock', 'conv_module')
        # grid and train are static python values (argnums count self=0).
        # Explicit names keep param paths identical with remat on/off
        # (nn.remat's auto-name would be remat(Checkpoint...), forking the
        # init RNG stream and breaking checkpoint compatibility).
        n_blocks = 0

        def Block(out_ch):
            nonlocal n_blocks
            name = f'SparseBasicBlock_{n_blocks}'
            n_blocks += 1
            if self.remat_blocks:
                return nn.remat(SparseBasicBlock,
                                static_argnums=(4, 5))(out_ch, name=name)
            return SparseBasicBlock(out_ch, name=name)
        num_stages = len(self.encoder_channels)
        stages = []
        for i, blocks in enumerate(self.encoder_channels):
            for j, out_ch in enumerate(blocks):
                pad = self.encoder_paddings[i][j]
                pad3 = tuple(pad) if isinstance(pad, (tuple, list)) \
                    else (pad,) * 3
                if self.block_type == 'basicblock':
                    is_down = (j == len(blocks) - 1) \
                        and (i != num_stages - 1)
                    if is_down:
                        x = to_rows(x, tmf, c.shape[1])
                        x, c, v, g = SparseConvBlock(
                            out_ch, 'spconv', kernel_size=(3, 3, 3),
                            stride=(2, 2, 2), padding=pad3,
                            out_budget=self.stage_budgets[i])(
                                x, c, v, g, train)
                        # budget guardrail: occupancy 1.0 means the
                        # static budget saturated (coordinate-order
                        # truncation, spatially biased — CLAUDE.md)
                        self.sow('diagnostics', f'occupancy_stage{i}',
                                 v.sum(-1).astype(jnp.float32).mean()
                                 / self.stage_budgets[i])
                        x, nmap, hit, blk_valid, tmf = make_stage_maps(
                            i + 1, x, c, v, g)
                    else:
                        x = Block(out_ch)(x, c, blk_valid, g, train,
                                          nmap, hit)
                else:  # conv_module (sparse_encoder.make_encoder_layers)
                    is_down = (i != 0 and j == 0)
                    if is_down:
                        x, c, v, g = SparseConvBlock(
                            out_ch, 'spconv', kernel_size=(3, 3, 3),
                            stride=(2, 2, 2), padding=pad3,
                            out_budget=self.stage_budgets[i - 1])(
                                x, c, v, g, train)
                    else:
                        x, c, v, g = SparseConvBlock(out_ch, 'subm')(
                            x, c, v, g, train)
            stages.append((to_rows(x, tmf, c.shape[1]), c, v, g)
                          if self.return_stages else (x, c, v, g))

        x = to_rows(x, tmf, c.shape[1])
        tmf = None
        x, c, v, g = SparseConvBlock(
            self.output_channels, 'spconv', kernel_size=(3, 1, 1),
            stride=(2, 1, 1), padding=(0, 0, 0),
            out_budget=self.out_budget)(x, c, v, g, train)
        self.sow('diagnostics', 'occupancy_out',
                 v.sum(-1).astype(jnp.float32).mean() / self.out_budget)

        # densify: [B, C, D, H, W] -> NHWC [B, H, W, C*D]
        nz, ny, nx = g

        def densify(f, cc, vv):
            z = jnp.where(vv, cc[:, 0], nz)
            y = jnp.where(vv, cc[:, 1], 0)
            xx = jnp.where(vv, cc[:, 2], 0)
            dense = jnp.zeros((nz + 1, ny, nx, f.shape[-1]), f.dtype)
            dense = dense.at[z, y, xx].set(jnp.where(vv[:, None], f, 0.0))
            return dense[:nz]  # [D, H, W, C]

        dense = jax.vmap(densify)(x, c, v)  # [B, D, H, W, C]
        B = dense.shape[0]
        # channel-major over (C, D) to match the reference's view(N, C*D, ...)
        dense = dense.transpose(0, 2, 3, 4, 1)  # [B, H, W, C, D]
        bev = dense.reshape(B, ny, nx, -1)
        if self.return_stages:
            return bev, stages
        return bev


class SparseUNet(nn.Module):
    """PartA2's UNet-shaped sparse middle encoder
    (/root/reference/mmdet3d/models/middle_encoders/sparse_unet.py:19).

    Encoder: conv_input SubM, 4 stages (stages 2-4 start with a stride-2
    SparseConv3d); conv_out (3,1,1) s(2,1,1) densified to the BEV map for
    the RPN. Decoder: per stage, lateral SparseBasicBlock + concat-merge
    (with the reference's interleaved channel-pair reduction) + upsample
    via SparseInverseConv3d reusing the matching downsample's rulebook
    (indice_key semantics); the last stage upsamples with a SubM conv.

    Returns (bev [B, H, W, C*D], seg_feats [B, N, C_seg]) where seg_feats
    live on the INPUT active set (voxel-wise features for the semantic
    head / RoI pooling).
    """
    in_channels: int = 4
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    encoder_sconv_paddings: Sequence = (1, 1, (0, 1, 1))  # spconv2..4
    decoder_channels: Sequence[Sequence[int]] = (
        (64, 64, 64), (64, 64, 32), (32, 32, 16), (16, 16, 16))
    stage_budgets: Sequence[int] = (16000, 16000, 16000)
    out_budget: int = 16000

    def _strided(self, x, c, v, g, out_ch, pad, budget, train, name):
        """stride-2 SparseConv3d + BN + relu; returns the rulebook so the
        decoder's inverse conv can reuse it."""
        K = 27
        w = self.param(name, conv_init, (K, x.shape[-1], out_ch))
        B, N, C = x.shape
        oc, ov, og, fm_flat, bm_flat = sp.downsample_rulebook_batched(
            c, v, tuple(g), (3, 3, 3), (2, 2, 2),
            tuple(pad) if isinstance(pad, (tuple, list)) else (pad,) * 3,
            budget)
        M = ov.shape[-1]
        x = sp.rulebook_conv(x.reshape(B * N, C), w, fm_flat, bm_flat,
                             ov.reshape(B * M)).reshape(B, M, out_ch)
        x = MaskedBatchNorm()(x, ov, train)
        x = nn.relu(x)
        return x, oc, ov, og, (fm_flat, bm_flat)

    @nn.compact
    def __call__(self, feats, coords, valid, train: bool = True):
        grid = tuple(self.sparse_shape)

        def make_map(cc, vv, g):
            st = sp.SparseTensor(jnp.zeros((cc.shape[0], 1), jnp.float32),
                                 cc, vv, tuple(g))
            return sp.build_subm_map(st)

        nmaps = {}  # per coordinate set, shared by all SubM convs on it
        nmaps[0] = jax.vmap(lambda cc, vv: make_map(cc, vv, grid))(
            coords, valid)

        def subm(x, vv, nmap_hit, out_ch):
            return SubMConv3dMapped(out_ch)(x, vv, *nmap_hit)

        def subm_bn(x, vv, nmap_hit, out_ch):
            x = subm(x, vv, nmap_hit, out_ch)
            x = MaskedBatchNorm()(x, vv, train)
            return nn.relu(x)

        x = subm_bn(feats, valid, nmaps[0], self.base_channels)

        sets = {0: (coords, valid, grid)}
        rulebooks = {}
        encode_features = []
        c, v, g = coords, valid, grid
        for i, blocks in enumerate(self.encoder_channels):
            for j, out_ch in enumerate(blocks):
                if i != 0 and j == 0:
                    x, c, v, g, rb = self._strided(
                        x, c, v, g, out_ch,
                        self.encoder_sconv_paddings[i - 1],
                        self.stage_budgets[i - 1], train,
                        name=f'spconv{i + 1}')
                    rulebooks[i] = rb
                    sets[i] = (c, v, g)
                    nmaps[i] = jax.vmap(
                        lambda cc, vv, gg=g: make_map(cc, vv, gg))(c, v)
                else:
                    x = subm_bn(x, v, nmaps[i], out_ch)
            encode_features.append((x, i))

        # conv_out: (3,1,1) s(2,1,1) p0 -> dense BEV (sparse_unet.py:96-134)
        x_out, c_out, v_out, g_out, _ = self._strided_out(
            encode_features[-1][0], c, v, g, train)
        nz, ny, nx = g_out

        def densify(f, cc, vv):
            z = jnp.where(vv, cc[:, 0], nz)
            y = jnp.where(vv, cc[:, 1], 0)
            xx = jnp.where(vv, cc[:, 2], 0)
            dense = jnp.zeros((nz + 1, ny, nx, f.shape[-1]), f.dtype)
            dense = dense.at[z, y, xx].set(jnp.where(vv[:, None], f, 0.0))
            return dense[:nz]

        dense = jax.vmap(densify)(x_out, c_out, v_out)
        B = dense.shape[0]
        bev = dense.transpose(0, 2, 3, 4, 1).reshape(B, ny, nx, -1)

        # decoder: stage_num .. 1 (sparse_unet.py:142-178)
        num = len(self.encoder_channels)
        x = encode_features[-1][0]
        for d, ch in enumerate(self.decoder_channels):
            i = num - 1 - d           # encoder set index this block lives on
            x_lat, _ = encode_features[i]
            _, vv, _ = sets[i]
            # lateral SparseBasicBlock (two SubM + BN, residual)
            ident = x_lat
            l1 = subm_bn(x_lat, vv, nmaps[i], ch[0])
            l2 = subm(l1, vv, nmaps[i], ch[0])
            l2 = MaskedBatchNorm()(l2, vv, train)
            lat = nn.relu(l2 + ident)
            cat = jnp.concatenate([x, lat], axis=-1)       # [B, N, 2C]
            merged = subm_bn(cat, vv, nmaps[i], ch[1])
            # reduce_channel: interleaved channel pairs (sparse_unet.py:186)
            reduced = cat.reshape(cat.shape[0], cat.shape[1], ch[1],
                                  -1).sum(-1)
            x = merged + reduced
            if i != 0:
                # upsample: inverse conv through the downsample's rulebook
                fm_flat, bm_flat = rulebooks[i]
                _, pv, _ = sets[i - 1]
                w = self.param(f'inv_{i}', conv_init,
                               (27, x.shape[-1], ch[2]))
                # inverse conv = rulebook conv with fwd/bwd swapped, so
                # the flat maps swap roles: outputs are the [B*N]
                # pre-downsample set, inputs the [B*M] downsampled one
                B, M, C = x.shape
                x = sp.rulebook_conv(
                    x.reshape(B * M, C), w, bm_flat, fm_flat,
                    pv.reshape(-1)).reshape(B, pv.shape[-1], ch[2])
                x = MaskedBatchNorm()(x, pv, train)
                x = nn.relu(x)
            else:
                x = subm_bn(x, vv, nmaps[0], ch[2])
        return bev, x

    def _strided_out(self, x, c, v, g, train):
        w = self.param('conv_out', conv_init,
                       (3, x.shape[-1], self.output_channels))

        B, N, C = x.shape
        oc, ov, og, fm_flat, bm_flat = sp.downsample_rulebook_batched(
            c, v, tuple(g), (3, 1, 1), (2, 1, 1), (0, 0, 0),
            self.out_budget)
        M = ov.shape[-1]
        x = sp.rulebook_conv(
            x.reshape(B * N, C), w, fm_flat, bm_flat,
            ov.reshape(B * M)).reshape(B, M, self.output_channels)
        x = MaskedBatchNorm()(x, ov, train)
        x = nn.relu(x)
        return x, oc, ov, og, (fm_flat, bm_flat)


class PointPillarsScatter(nn.Module):
    """Scatter pillar features to a dense NHWC canvas
    (pillar_scatter.py:10)."""
    output_shape: Tuple[int, int]  # (ny, nx)

    def __call__(self, feats, coords, valid):
        """feats [B, V, C]; coords [B, V, 3] (z,y,x); valid [B, V].

        Returns [B, H, W, C].
        """
        canvas = jax.vmap(
            lambda f, c, v: pillar_scatter(f, c, v, self.output_shape)
        )(feats, coords, valid)
        return canvas.transpose(0, 2, 3, 1)
