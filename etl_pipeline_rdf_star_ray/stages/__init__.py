"""Pipeline stages: partitioning, merge, mapping lift, annotation join.

Stateless stages are plain functions passed to ``map_batches`` (elastic
tasks); stateful stages are callable classes run as actor pools (SURVEY.md
§7.3).
"""
