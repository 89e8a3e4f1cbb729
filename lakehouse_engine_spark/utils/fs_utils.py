"""Filesystem existence checks that distinguish 'missing' from 'broken'.

Several stateful flows (delta-merge first load, sensor control table,
cross-run dedup state) branch on "does the target exist yet?". Wrapping
the *read* in a bare ``except Exception`` conflates a genuinely missing
path with a corrupt file or a transient FS/permission error — and the
fallback for "missing" is destructive in every one of those flows
(overwrite the target, treat all sensors as never-fired, re-emit
previously-ingested rows). These helpers ask the filesystem the actual
question, so real failures propagate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, location: str) -> bool:
    """True iff ``location`` exists, via the Hadoop FileSystem of the path
    itself (works for local, HDFS, and S3A URIs alike). Falls back to a
    read probe narrowly matched on path-not-found under Spark Connect
    (no ``_jvm``); any other read error propagates."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(location)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath))
    except AttributeError:  # Spark Connect: no _jvm
        from pyspark.errors import AnalysisException

        try:
            spark.read.load(location).schema
            return True
        except AnalysisException as exc:
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return False
            raise
