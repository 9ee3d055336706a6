"""Entrypoint test fixtures live in the top-level conftest."""
