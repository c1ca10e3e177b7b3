"""Resumable, idempotent batch pipeline: checkpoint claim loop,
transactional per-partition sink, lineage + metrics."""
