"""IO package: reader/writer factories (reference ``io/``)."""
