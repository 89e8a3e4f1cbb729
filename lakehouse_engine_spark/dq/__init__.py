"""Native data-quality engine (reference ``dq_processors/`` without the GE dependency)."""
