"""Logical-plan layer: query registry, reference models, materialization."""
