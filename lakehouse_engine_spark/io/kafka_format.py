"""Kafka source/sink format indirection.

The reader/writer factories dispatch Kafka specs to ``KAFKA_FORMAT``
(normally the JVM ``kafka`` connector — reference
``io/readers/kafka_reader.py:26-44`` / ``io/writers/kafka_writer.py:35-79``).
Tests (and brokerless environments) can point this at a registered PySpark
Python Data Source exposing the same schema/options contract, which lets the
factory branches run end-to-end without a broker: see
``tests/fake_kafka.py``.
"""

KAFKA_FORMAT = "kafka"


def kafka_format() -> str:
    """The active Kafka source/sink short name."""
    return KAFKA_FORMAT
