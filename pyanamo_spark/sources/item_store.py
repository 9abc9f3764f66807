"""Custom Python Data Source for a PyAnamo-style item store
(SURVEY.md §4 verdict / north star: "DynamoDB via connector becomes an
optional source/sink").

The reference's table is DynamoDB; its hot access path is the
``ItemState = :state`` GSI seek (client.py:88, workflow-gsi-index.json).
This source is the connector-shaped stand-in: a directory of JSON-lines
item documents ("one shard per file" ≈ one DynamoDB partition), exposed
through Spark 4's Python Data Source API with:

  - one InputPartition per shard file → parallel split reads, no
    driver materialization (the reference paginates everything into
    client RAM — SURVEY §4 R4)
  - **filter pushdown** for ItemState/itemID equality — the GSI-seek
    semantics: a pushed state filter skips non-matching rows at the
    source, and Spark drops the filter from the plan
  - a write path (append) producing one shard per task

A real DynamoDB deployment swaps the file I/O for the AWS SDK calls;
partition planning, pushdown, and schema stay identical.

Register per session:  spark.dataSource.register(ItemStoreDataSource)
then                   spark.read.format("pyanamo_items").load(path)
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

ITEM_SCHEMA_DDL = (
    "itemID string, taskID string, task_script string, "
    "ItemState string, lockID string, Log_Length bigint"
)

#: columns whose equality filters the source handles (the 4 GSIs all
#: key on ItemState; itemID is the table hash key)
PUSHABLE = {"ItemState", "itemID", "taskID"}


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ItemStoreReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyanamo_items requires a path")
        self._pushed: list[tuple[str, object]] = []
        self._not_null: list[str] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept equality (and its companion IsNotNull) on key/index
        columns — the GSI seek; everything else stays in the Spark
        plan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute[0] in PUSHABLE:
                self._pushed.append((f.attribute[0], f.value))
            elif isinstance(f, IsNotNull) and f.attribute[0] in PUSHABLE:
                self._not_null.append(f.attribute[0])
            else:
                yield f

    def partitions(self) -> list[_ShardPartition]:
        shards = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")
        )
        return [_ShardPartition(p) for p in shards] or [
            _ShardPartition("")
        ]

    def read(self, partition: _ShardPartition):
        if not partition.path:
            return
        fields = [f.name for f in self.schema.fields]
        with open(partition.path) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                doc = json.loads(line)
                if any(doc.get(col) != val for col, val in self._pushed):
                    continue
                if any(doc.get(col) is None for col in self._not_null):
                    continue
                yield tuple(doc.get(name) for name in fields)


class ItemStoreStreamReader(SimpleDataSourceStreamReader):
    """Continuous tail of the item store — the DynamoDB-Streams
    analogue for the connector.

    Shards are append-only and atomically renamed into place by the
    writer, so "how many shards exist, in name order" is a complete,
    replayable offset: ``read(start)`` serves every row of shards
    [start.n, now) and advances to now; ``readBetweenOffsets`` replays
    exactly the same slice on recovery, giving the engine exactly-once
    delivery without any side ledger. One offset integer per stream —
    no per-row bookkeeping — because ordering lives in the shard
    naming scheme, the same property a real stream's sequence numbers
    provide.
    """

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyanamo_items requires a path")

    def _shards(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".jsonl")
        )

    def initialOffset(self) -> dict:
        return {"n": 0}

    def _rows(self, shards: list[str]):
        fields = [f.name for f in self.schema.fields]
        for path in shards:
            with open(path) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        doc = json.loads(line)
                        yield tuple(doc.get(name) for name in fields)

    def read(self, start: dict):
        # materialized, not a generator: the engine pickles the
        # prefetched batch so a failed epoch can be replayed verbatim
        # (SimpleDataSourceStreamReader is the driver-prefetch API —
        # right for a control-plane-sized store; a high-volume stream
        # would use DataSourceStreamReader with real input partitions)
        shards = self._shards()
        return list(self._rows(shards[start["n"]:])), {"n": len(shards)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(self._shards()[start["n"]:end["n"]]))


class _Commit(WriterCommitMessage):
    def __init__(self, tmp_path: str, final_path: str):
        self.tmp_path = tmp_path
        self.final_path = final_path


class ItemStoreWriter(DataSourceWriter):
    """Append/overwrite writer with task-temp staging.

    Tasks write to uniquely-named ``.tmp`` files (job uuid + partition
    id — concurrent/repeated appends never collide on shard names);
    ``commit`` renames them to visible ``.jsonl`` shards and, for
    overwrite mode, removes pre-existing shards; ``abort`` deletes the
    temps, so a failed job leaves nothing visible.
    """

    def __init__(self, options, overwrite: bool):
        import uuid

        self.path = options.get("path")
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex[:12]
        os.makedirs(self.path, exist_ok=True)

    def write(self, rows) -> _Commit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = f"shard-{self.job_id}-{pid:05d}"
        tmp = os.path.join(self.path, base + ".tmp")
        with open(tmp, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict()) + "\n")
        return _Commit(tmp, os.path.join(self.path, base + ".jsonl"))

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        for m in messages:
            os.rename(m.tmp_path, m.final_path)

    def abort(self, messages) -> None:
        for m in messages:
            if m and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class ItemStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pyanamo_items"

    def schema(self) -> str:
        return ITEM_SCHEMA_DDL

    def reader(self, schema: StructType) -> ItemStoreReader:
        return ItemStoreReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ItemStoreWriter:
        return ItemStoreWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> ItemStoreStreamReader:
        return ItemStoreStreamReader(schema, self.options)
