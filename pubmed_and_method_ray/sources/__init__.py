"""Corpus generation and checkpoint/lineage IO."""
