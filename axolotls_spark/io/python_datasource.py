"""Custom connector via the Python Data Source API (Spark 4).

The reference's only ingress is in-memory Arrow interop
(``numeric_column.py:138-159``); a Spark-native engine's extension
point for "a source Spark doesn't ship" is the DataSource V2 Python
API: declare schema + partitions, and each partition's ``read``
runs ON THE EXECUTORS — the driver only plans. This demonstrates the
full contract with a deterministic synthetic corpus source (the
shape of any sharded REST/scan connector):

- ``partitions()`` returns one ``InputPartition`` per shard, so a
  1000-executor cluster reads 1000 shards concurrently — parallelism
  is declared, not discovered.
- ``read(partition)`` yields rows for ONE shard only; no state is
  shared across partitions, so the source scales horizontally.
- Determinism comes from md5 arithmetic on (shard, row) — retried
  tasks regenerate identical rows, which is what makes the source
  safe under Spark's speculative/retry execution.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _h(*parts: int) -> int:
    raw = ":".join(str(p) for p in parts).encode()
    return int(hashlib.md5(raw).hexdigest()[:15], 16)


_LANGS = ("en", "de", "fr", "es")
_WORDS = (
    "data", "spark", "table", "value", "query", "join", "scan",
    "shuffle", "batch", "stream",
)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` source.

    Options: ``shards`` (default 8), ``rows_per_shard`` (default 100).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, shard int, lang string, text string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(
            int(self.options.get("shards", 8)),
            int(self.options.get("rows_per_shard", 100)),
        )

    def streamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(
            int(self.options.get("shards", 8)),
            int(self.options.get("rows_per_shard", 100)),
            int(self.options.get("max_batches", 3)),
        )


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, shards: int, rows_per_shard: int) -> None:
        self.shards = shards
        self.rows_per_shard = rows_per_shard

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.shards)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        shard = partition.value
        for i in range(self.rows_per_shard):
            doc_id = shard * self.rows_per_shard + i
            lang = _LANGS[_h(shard, i, 0) % len(_LANGS)]
            n_words = 3 + _h(shard, i, 1) % 8
            text = " ".join(
                _WORDS[_h(shard, i, 2 + k) % len(_WORDS)]
                for k in range(n_words)
            )
            yield (doc_id, shard, lang, text)


class _BatchPartition(InputPartition):
    def __init__(self, batch: int, shard: int) -> None:
        self.batch = batch
        self.shard = shard


class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Streaming half of the connector (micro-batch DataSource V2):
    offsets are plain dicts ({"batch": n}); each micro-batch plans
    one ``InputPartition`` per shard, and ``read`` runs ON THE
    EXECUTORS — the full-throughput API, not the driver-side
    ``SimpleDataSourceStreamReader``. Offsets advance up to
    ``max_batches`` then hold (a finite source, so AvailableNow
    drains and stops); replaying a checkpointed offset range
    regenerates identical rows, which is the exactly-once contract
    a file/Kafka source provides natively.
    """

    def __init__(self, shards: int, rows_per_shard: int, max_batches: int):
        self.shards = shards
        self.rows_per_shard = rows_per_shard
        self.max_batches = max_batches

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def latestOffset(self) -> dict:
        return {"batch": self.max_batches}

    def partitions(self, start: dict, end: dict):
        return [
            _BatchPartition(b, s)
            for b in range(start["batch"], end["batch"])
            for s in range(self.shards)
        ]

    def read(self, partition: _BatchPartition) -> Iterator[tuple]:
        b, shard = partition.batch, partition.shard
        base = (b * self.shards + shard) * self.rows_per_shard
        for i in range(self.rows_per_shard):
            doc_id = base + i
            lang = _LANGS[_h(b, shard, i, 0) % len(_LANGS)]
            n_words = 3 + _h(b, shard, i, 1) % 8
            text = " ".join(
                _WORDS[_h(b, shard, i, 2 + k) % len(_WORDS)]
                for k in range(n_words)
            )
            yield (doc_id, shard, lang, text)

    def commit(self, end: dict) -> None:
        pass


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
