"""Stages: map_batches callables / actor classes for Dataset pipelines."""
