"""Deterministic synthetic-fixture generation (FIXTURES.md)."""
