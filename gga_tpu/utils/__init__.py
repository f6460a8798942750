"""Runtime utilities."""
from .env import setup_compilation_cache

__all__ = ['setup_compilation_cache']
