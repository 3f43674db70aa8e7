"""Reusable Catalyst expression builders (pure Column functions)."""
