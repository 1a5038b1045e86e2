"""Ray Data stages: map_batches / groupby building blocks of the pipelines."""
