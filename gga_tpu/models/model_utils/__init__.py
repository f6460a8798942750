from .transformer import GroupFree3DDecoderLayer, PositionalMLP

__all__ = ['GroupFree3DDecoderLayer', 'PositionalMLP']
