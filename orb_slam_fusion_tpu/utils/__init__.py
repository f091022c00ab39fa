"""Shared utilities."""

from .scatter import masked_set  # noqa: F401
