"""End-to-end pipelines: CDC ingest/replay, versioning ops (diff /
point-in-time / history), dedup family, text analysis, similarity search,
multimodal plumbing, and generic analytics operators."""
