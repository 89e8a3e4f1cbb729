"""Transformers: the dataflow operator registry (reference §2.3, 40 ops)."""
