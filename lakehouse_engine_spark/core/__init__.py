"""Core package: spec dataclasses, execution environment, managers."""
