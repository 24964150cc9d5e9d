"""Pipeline stages: each is a function ``(Dataset, config) -> Dataset``
built from ``map_batches`` / ``groupby`` / ``join`` primitives only."""
