"""PointNet++ single-scale-grouping backbone.

Rebuild of PointNet2SASSG
(/root/reference/mmdet3d/models/backbones/pointnet2_sa_ssg.py) on the
jittable point ops: 4 set-abstraction layers (FPS -> ball query -> shared
MLP -> max pool, normalize_xyz) and 2 feature-propagation layers (three-NN
inverse-distance interpolation + MLP).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import points as po
from ..layers import MaskedBatchNorm, conv_init


class SharedMLP(nn.Module):
    channels: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, valid, train):
        """x: [..., C]; valid: broadcastable mask over leading dims."""
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, use_bias=False, kernel_init=conv_init,
                         name=f'fc{i}')(x)
            x = MaskedBatchNorm(name=f'bn{i}')(x, valid, train)
            x = nn.relu(x)
        return x


class PointSAModule(nn.Module):
    """Set abstraction (mmdet3d PointSAModule, pool max, use_xyz,
    normalize_xyz)."""
    num_point: int
    radius: float
    num_sample: int
    mlp_channels: Tuple[int, ...]

    @nn.compact
    def __call__(self, xyz, features, valid, train, target_xyz=None,
                 target_valid=None):
        """xyz [B, N, 3]; features [B, N, C] or None; valid [B, N].

        Returns (new_xyz [B, S, 3], new_feats [B, S, C'], new_valid
        [B, S])."""
        if target_xyz is None:
            idx = jax.vmap(lambda p, v: po.furthest_point_sample(
                p, v, self.num_point))(xyz, valid)
            new_xyz = jnp.take_along_axis(xyz, idx[..., None], 1)
            new_valid = jnp.take_along_axis(valid, idx, 1)
        else:
            new_xyz, new_valid = target_xyz, target_valid

        def group(p, f, v, c):
            if f is None:
                out, mask = po.query_and_group(p, None, c, self.radius,
                                               self.num_sample, p_valid=v)
                rel = out
                feats = None
            else:
                out, mask = po.query_and_group(p, f, c, self.radius,
                                               self.num_sample, p_valid=v)
                rel, feats = out[..., :3], out[..., 3:]
            rel = rel / self.radius  # normalize_xyz
            return (rel if feats is None
                    else jnp.concatenate([rel, feats], -1)), mask

        if features is None:
            grouped, mask = jax.vmap(
                lambda p, v, c: group(p, None, v, c))(xyz, valid, new_xyz)
        else:
            grouped, mask = jax.vmap(group)(xyz, features, valid, new_xyz)

        g = SharedMLP(self.mlp_channels)(grouped, mask, train)
        neg = jnp.finfo(g.dtype).min
        pooled = jnp.where(mask[..., None], g, neg).max(axis=-2)
        pooled = jnp.where((mask.any(-1) & new_valid)[..., None], pooled,
                           0.0)
        return new_xyz, pooled, new_valid


class PointFPModule(nn.Module):
    """Feature propagation (three-NN interpolate + MLP)."""
    mlp_channels: Tuple[int, ...]

    @nn.compact
    def __call__(self, target_xyz, target_feats, source_xyz, source_feats,
                 source_valid, target_valid, train):
        def interp(tq, sx, sf, sv):
            d, idx = po.three_nn(tq, sx, s_valid=sv)
            return po.three_interpolate(sf, idx, d)

        up = jax.vmap(interp)(target_xyz, source_xyz, source_feats,
                              source_valid)
        if target_feats is not None:
            up = jnp.concatenate([up, target_feats], -1)
        return SharedMLP(self.mlp_channels)(up, target_valid, train)


class PointNet2SASSG(nn.Module):
    in_channels: int = 4
    num_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Tuple[int, ...] = (64, 32, 16, 16)
    sa_channels: Sequence[Tuple[int, ...]] = (
        (64, 64, 128), (128, 128, 256), (128, 128, 256), (128, 128, 256))
    fp_channels: Sequence[Tuple[int, ...]] = ((256, 256), (256, 256))

    @nn.compact
    def __call__(self, points, valid, train: bool = True):
        """points [B, P, in_channels] (xyz + features); valid [B, P].

        Returns dict: fp_xyz/fp_features/fp_valid (last FP level) plus
        sa_xyz/sa_features lists (for the vote head's seed points).
        """
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        sa_xyz, sa_feats, sa_valid = [xyz], [feats], [valid]
        for i in range(len(self.num_points)):
            x, f, v = PointSAModule(
                self.num_points[i], self.radii[i], self.num_samples[i],
                tuple(self.sa_channels[i]), name=f'sa{i}')(
                    sa_xyz[-1], sa_feats[-1], sa_valid[-1], train)
            sa_xyz.append(x)
            sa_feats.append(f)
            sa_valid.append(v)

        fp_x, fp_f, fp_v = sa_xyz[-1], sa_feats[-1], sa_valid[-1]
        n_sa = len(sa_xyz)
        for i, ch in enumerate(self.fp_channels):
            tgt = n_sa - 2 - i
            fp_f = PointFPModule(tuple(ch), name=f'fp{i}')(
                sa_xyz[tgt], sa_feats[tgt], fp_x, fp_f, fp_v,
                sa_valid[tgt], train)
            fp_x, fp_v = sa_xyz[tgt], sa_valid[tgt]
        return dict(fp_xyz=fp_x, fp_features=fp_f, fp_valid=fp_v,
                    sa_xyz=sa_xyz, sa_features=sa_feats, sa_valid=sa_valid)


def sample_points_multi_mode(xyz, features, valid, num_points, fps_mods,
                             fps_sample_ranges):
    """Multi-mode FPS over consecutive point segments (one sample).

    Behavioral rebuild of mmcv's ``PointsSampler``
    (consumed at /root/reference/mmdet3d/ops/pointnet_modules/
    point_sa_module.py:82-90): each (mod, sample_range, npoint) triple
    samples from the next ``sample_range`` points (-1 = the rest);
    'D-FPS' uses xyz distance, 'F-FPS' distance over [xyz, features],
    'FS' runs BOTH and concatenates (F-FPS half FIRST — 3DSSD's next
    level slices that half by sample range).

    Returns [sum(npoints)] int32 indices into the input order.
    """
    N = xyz.shape[0]
    idx_parts = []
    start = 0
    for mod, rng, npt in zip(fps_mods, fps_sample_ranges, num_points):
        end = N if rng == -1 else start + rng
        sub_xyz = xyz[start:end]
        sub_valid = valid[start:end]
        if mod in ('F-FPS', 'FS'):
            sub_f = jnp.concatenate([sub_xyz, features[start:end]], -1)
            idx_parts.append(po.furthest_point_sample(
                sub_f, sub_valid, npt) + start)
        if mod in ('D-FPS', 'FS'):
            idx_parts.append(po.furthest_point_sample(
                sub_xyz, sub_valid, npt) + start)
        start = end
    return jnp.concatenate(idx_parts)


class PointSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (mmdet3d PointSAModuleMSG,
    /root/reference/mmdet3d/ops/pointnet_modules/point_sa_module.py):
    one FPS sample set, several (radius, nsample, mlp) branches whose
    max-pooled features concatenate, then a 1x1 aggregation layer.
    ``fps_mods``/``fps_sample_ranges`` enable 3DSSD's F-FPS/FS sampling
    (``num_point`` is then per-mode; 'FS' outputs 2x its num_point)."""
    num_point: Tuple[int, ...]
    radii: Tuple[float, ...]
    num_samples: Tuple[int, ...]
    mlp_channels: Tuple[Tuple[int, ...], ...]
    aggregation_channels: int = 0    # 0 = no aggregation conv
    fps_mods: Tuple[str, ...] = ('D-FPS',)
    fps_sample_ranges: Tuple[int, ...] = (-1,)
    # both MSG consumers (PointRCNN, 3DSSD) configure the reference's
    # sa_cfg with normalize_xyz=False
    normalize_xyz: bool = False

    @nn.compact
    def __call__(self, xyz, features, valid, train, target_xyz=None,
                 target_valid=None):
        if target_xyz is not None:
            # 'spec' aggregation (vote_head.py:192): group around given
            # centers instead of sampling
            new_xyz, new_valid = target_xyz, target_valid
        else:
            npts = (self.num_point,) if isinstance(self.num_point, int) \
                else tuple(self.num_point)
            feats_or_zero = features if features is not None else \
                jnp.zeros(xyz.shape[:-1] + (0,), xyz.dtype)
            idx = jax.vmap(lambda p, f, v: sample_points_multi_mode(
                p, f, v, npts, self.fps_mods, self.fps_sample_ranges))(
                xyz, feats_or_zero, valid)
            new_xyz = jnp.take_along_axis(xyz, idx[..., None], 1)
            new_valid = jnp.take_along_axis(valid, idx, 1)

        outs = []
        for bi, (radius, nsample, mlps) in enumerate(
                zip(self.radii, self.num_samples, self.mlp_channels)):
            def group(p, f, v, c, radius=radius, nsample=nsample):
                out, mask = po.query_and_group(p, f, c, radius, nsample,
                                               p_valid=v)
                if f is None:
                    rel, feats = out, None
                else:
                    rel, feats = out[..., :3], out[..., 3:]
                if self.normalize_xyz:
                    rel = rel / radius
                return (rel if feats is None
                        else jnp.concatenate([rel, feats], -1)), mask

            if features is None:
                grouped, mask = jax.vmap(
                    lambda p, v, c, g=group: g(p, None, v, c))(
                        xyz, valid, new_xyz)
            else:
                grouped, mask = jax.vmap(group)(xyz, features, valid,
                                                new_xyz)
            g = SharedMLP(tuple(mlps), name=f'mlp{bi}')(grouped, mask,
                                                        train)
            neg = jnp.finfo(g.dtype).min
            pooled = jnp.where(mask[..., None], g, neg).max(axis=-2)
            pooled = jnp.where((mask.any(-1) & new_valid)[..., None],
                               pooled, 0.0)
            outs.append(pooled)
        feats = jnp.concatenate(outs, -1)
        if self.aggregation_channels:
            feats = SharedMLP((self.aggregation_channels,),
                              name='aggregation')(feats, new_valid, train)
        return new_xyz, feats, new_valid


class PointNet2SAMSG(nn.Module):
    """Multi-scale-grouping PointNet++ encoder
    (/root/reference/mmdet3d/models/backbones/pointnet2_sa_msg.py:13)
    with per-level fps_mods/fps_sample_range_lists ('D-FPS', 'F-FPS',
    'FS' — 3DSSD's feature-FPS sampling).

    Returns dict(sa_xyz/sa_features/sa_valid lists) like PointNet2SASSG.
    """
    in_channels: int = 4
    num_points: Sequence = (4096, 512, 256)
    radii: Sequence[Tuple[float, ...]] = (
        (0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8))
    num_samples: Sequence[Tuple[int, ...]] = (
        (32, 32, 64), (32, 32, 64), (32, 32, 32))
    sa_channels: Sequence[Sequence[Tuple[int, ...]]] = (
        ((16, 16, 32), (16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 64, 128), (64, 96, 128)),
        ((128, 128, 256), (128, 192, 256), (128, 256, 256)))
    aggregation_channels: Tuple[int, ...] = (64, 128, 256)
    # None = D-FPS over the full range at every level
    fps_mods: Sequence = None
    fps_sample_range_lists: Sequence = None

    @nn.compact
    def __call__(self, points, valid, train: bool = True):
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None
        sa_xyz, sa_feats, sa_valid = [xyz], [feats], [valid]
        for i in range(len(self.num_points)):
            npt = self.num_points[i]
            mods = ('D-FPS',) if self.fps_mods is None \
                else tuple(self.fps_mods[i])
            ranges = (-1,) if self.fps_sample_range_lists is None \
                else tuple(self.fps_sample_range_lists[i])
            x, f, v = PointSAModuleMSG(
                npt if isinstance(npt, int) else tuple(npt),
                tuple(self.radii[i]),
                tuple(self.num_samples[i]),
                tuple(tuple(m) for m in self.sa_channels[i]),
                self.aggregation_channels[i],
                fps_mods=mods,
                fps_sample_ranges=ranges,
                name=f'sa{i}')(
                    sa_xyz[-1], sa_feats[-1], sa_valid[-1], train)
            sa_xyz.append(x)
            sa_feats.append(f)
            sa_valid.append(v)
        return dict(sa_xyz=sa_xyz, sa_features=sa_feats,
                    sa_valid=sa_valid, fp_xyz=sa_xyz[-1],
                    fp_features=sa_feats[-1], fp_valid=sa_valid[-1])
