"""Kafka reader/writer factory branches driven end-to-end against the
brokerless Python Data Source stand-in (tests/fake_kafka.py) — option
passthrough, the connector schema contract, and sink payload shaping."""

import json
import pathlib

import pytest

from lakehouse_engine_spark.core.definitions import InputSpec, OutputSpec
from lakehouse_engine_spark.io import kafka_format
from lakehouse_engine_spark.io.reader_factory import ReaderFactory
from lakehouse_engine_spark.io.writer_factory import WriterFactory


@pytest.fixture()
def fake_kafka(spark, monkeypatch):
    from tests.fake_kafka import FakeKafkaDataSource

    try:
        spark.dataSource.register(FakeKafkaDataSource)
    except Exception:
        pass  # already registered in this session
    monkeypatch.setattr(kafka_format, "KAFKA_FORMAT", "fake_kafka")
    return spark


def test_kafka_reader_passes_options_through(fake_kafka):
    df = ReaderFactory.get_data(
        fake_kafka,
        InputSpec(
            spec_id="k",
            data_format="kafka",
            read_type="batch",
            options={
                "kafka.bootstrap.servers": "broker:9092",
                "subscribe": "orders",
                "startingOffsets": "earliest",
                "fake.rows": "4",
            },
        ),
    )
    # connector schema contract
    assert [c for c, _ in df.dtypes] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType",
    ]
    rows = df.collect()
    assert len(rows) == 4  # earliest → full topic replay
    payload = json.loads(bytes(rows[0]["value"]).decode())
    assert payload["topic"] == "orders"  # subscribe option reached the source


def test_kafka_reader_latest_offsets_reads_nothing(fake_kafka):
    df = ReaderFactory.get_data(
        fake_kafka,
        InputSpec(
            spec_id="k",
            data_format="kafka",
            read_type="batch",
            options={"subscribe": "orders", "startingOffsets": "latest"},
        ),
    )
    assert df.count() == 0


def test_kafka_reader_requires_subscribe(fake_kafka):
    with pytest.raises(Exception, match="subscribe"):
        ReaderFactory.get_data(
            fake_kafka,
            InputSpec(spec_id="k", data_format="kafka", read_type="batch", options={}),
        ).collect()


def test_kafka_writer_shapes_payload(fake_kafka, tmp_path):
    sink = str(tmp_path / "sink")
    df = fake_kafka.createDataFrame(
        [("a", '{"x":1}'), ("b", '{"x":2}')], "k STRING, payload STRING"
    ).selectExpr("CAST(k AS BINARY) AS key", "CAST(payload AS BINARY) AS value")
    WriterFactory.write(
        fake_kafka,
        df,
        OutputSpec(
            spec_id="out",
            input_id="k",
            data_format="kafka",
            write_type="append",
            options={"topic": "events", "fake.sink.dir": sink},
        ),
    )
    recs = [
        json.loads(line)
        for p in pathlib.Path(sink).glob("*.jsonl")
        for line in p.read_text().splitlines()
    ]
    assert sorted((r["topic"], r["key"], r["value"]) for r in recs) == [
        ("events", "a", '{"x":1}'),
        ("events", "b", '{"x":2}'),
    ]


def test_kafka_writer_requires_value_column(fake_kafka, tmp_path):
    df = fake_kafka.createDataFrame([(1,)], "x INT")
    with pytest.raises(Exception, match="value"):
        WriterFactory.write(
            fake_kafka,
            df,
            OutputSpec(
                spec_id="out",
                input_id="k",
                data_format="kafka",
                write_type="append",
                options={"topic": "t", "fake.sink.dir": str(tmp_path)},
            ),
        )
