"""Utilities: image IO, logging."""
