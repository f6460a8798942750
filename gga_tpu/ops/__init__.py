"""Compute kernels: voxelization, scatter, sparse 3D conv."""
from . import scatter, sparse, voxelize

__all__ = ['scatter', 'sparse', 'voxelize']
