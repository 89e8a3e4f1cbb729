"""Terminators: post-write actions (reference ``terminators/``)."""
