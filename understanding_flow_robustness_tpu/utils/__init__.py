"""Shared utilities: compile cache, logging, meters, config."""

from .cache import enable_compilation_cache

__all__ = ["enable_compilation_cache"]
