"""Flax models: encoders, backbones, necks, heads, detectors."""
from . import layers, middle_encoders, voxel_encoders

__all__ = ['layers', 'middle_encoders', 'voxel_encoders']
