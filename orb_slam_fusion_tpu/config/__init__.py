"""Configuration loading."""

from .settings import load_settings, Settings  # noqa: F401
