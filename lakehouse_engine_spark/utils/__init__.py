"""Utility helpers: schema, ACON parsing, SQL splitting, JDBC derivation."""
