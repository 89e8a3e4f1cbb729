"""Brokerless Kafka stand-in: a PySpark Python Data Source exposing the
JVM kafka connector's schema and option contract (``subscribe``,
``startingOffsets``, ``kafka.bootstrap.servers``) so the engine's
reader/writer factory Kafka branches run end-to-end in tests.

Reads emit a deterministic message stream for the subscribed topic; writes
enforce the connector's payload contract (a ``value`` column, optional
``key``/``topic``) and record each row as a JSON line under the
``fake.sink.dir`` option so assertions can inspect what "reached the
broker".
"""

import datetime as dt
import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    WriterCommitMessage,
)

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


class FakeKafkaDataSource(DataSource):
    @classmethod
    def name(cls):
        return "fake_kafka"

    def schema(self):
        return KAFKA_SCHEMA

    def reader(self, schema):
        if "subscribe" not in self.options:
            raise ValueError("kafka source requires the 'subscribe' option")
        return _FakeKafkaReader(dict(self.options))

    def writer(self, schema, overwrite):
        names = [f.name for f in schema.fields]
        if "value" not in names:
            raise ValueError("kafka sink requires a 'value' column")
        return _FakeKafkaWriter(dict(self.options), names)


class _FakeKafkaReader(DataSourceReader):
    def __init__(self, options):
        self.options = options

    def read(self, partition):
        # Spark lower-cases data source option keys
        topic = self.options["subscribe"]
        n = int(self.options.get("fake.rows", "5"))
        start = 0
        if self.options.get("startingoffsets", "latest") == "latest":
            start = n  # nothing already in the topic → nothing to read
        for i in range(start, n):
            yield (
                f"k{i}".encode(),
                json.dumps({"topic": topic, "i": i}).encode(),
                topic,
                0,
                i,
                dt.datetime(2024, 1, 1, 0, 0, i),
                0,
            )


class _FakeKafkaWriter(DataSourceWriter):
    def __init__(self, options, column_names):
        if "fake.sink.dir" not in options:
            raise ValueError("fake_kafka sink requires fake.sink.dir")
        self.sink_dir = options["fake.sink.dir"]
        self.default_topic = options.get("topic")
        self.columns = column_names

    def write(self, rows):
        os.makedirs(self.sink_dir, exist_ok=True)
        path = os.path.join(self.sink_dir, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as fh:
            for row in rows:
                rec = dict(zip(self.columns, row))
                topic = rec.get("topic") or self.default_topic
                if topic is None:
                    raise ValueError("no topic column and no 'topic' option")
                val = rec["value"]
                fh.write(
                    json.dumps(
                        {
                            "topic": topic,
                            "key": (
                                bytes(rec["key"]).decode()
                                if rec.get("key") is not None
                                else None
                            ),
                            "value": bytes(val).decode() if val is not None else None,
                        }
                    )
                    + "\n"
                )
                n += 1
        return WriterCommitMessage()
