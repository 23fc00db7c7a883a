"""PySpark-4 Python DataSource: a deterministic synthetic-documents source.

The reference's only source is CSV-on-HDFS (``MovieRank.java:145-160``);
this demonstrates the extensible-source surface of the engine — the Python
DataSource API (Spark 4): schema declaration, option handling, partition
planning, and per-partition generator reads (Arrow-batched by the runtime).

Real uses of this exact shape: reading from an internal feed/API, fuzz-data
generation for load tests, or wrapping a format Spark lacks a native reader
for. The generator here is deterministic (pure function of doc_id), so
tests can assert byte-identical output across partitionings and reruns —
the same reproducibility convention as the rest of the engine.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "the quick spark engine shuffles rows into sorted batches while the "
    "planner prunes scans and broadcasts small tables"
).split()


def _doc_text(doc_id: int, doc_len: int = 24) -> str:
    # deterministic word-salad: pure function of doc_id, no RNG state
    k = len(_WORDS)
    return " ".join(_WORDS[(doc_id * 7 + j * 3) % k] for j in range(doc_len))


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("partitions", 8))

    def partitions(self):
        # one InputPartition per planned split — Spark schedules each as a
        # task, so read parallelism scales with the option, not the driver
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        # round-robin doc ids so every partition gets an equal share
        for doc_id in range(partition.value, self.n, self.num_partitions):
            yield (doc_id, _doc_text(doc_id))


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", 500).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
