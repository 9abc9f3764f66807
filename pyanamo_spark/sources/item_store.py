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
    writer, so the stream offset is the *list of shard names already
    delivered*: ``read(start)`` serves every shard not in the list (in
    name order) and appends the newly-served names; on recovery
    ``readBetweenOffsets`` replays exactly ``end − start``.  A
    name-set offset is insensitive to where a late shard sorts — a
    count-based offset silently skips any append whose name sorts
    before an already-delivered shard and re-delivers the tail (the
    exactly-once violation this design replaces).  Offset size grows
    with shard count, which is fine for a control-plane-sized store;
    the writer's monotonic sequence naming keeps the list ordered and
    compact to diff.
    """

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyanamo_items requires a path")

    def _shard_names(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            f for f in os.listdir(self.path) if f.endswith(".jsonl")
        )

    def initialOffset(self) -> dict:
        return {"delivered": []}

    def _delivered(self, offset: dict) -> list[str]:
        # migrate a legacy count offset {"n": k}: it meant "the first
        # k shards in name order at the time" — best-effort mapping
        if "delivered" in offset:
            return list(offset["delivered"])
        return self._shard_names()[: offset.get("n", 0)]

    def _rows(self, names: list[str]):
        fields = [f.name for f in self.schema.fields]
        for name in names:
            with open(os.path.join(self.path, name)) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        doc = json.loads(line)
                        yield tuple(doc.get(name_) for name_ in fields)

    def read(self, start: dict):
        # materialized, not a generator: the engine pickles the
        # prefetched batch so a failed epoch can be replayed verbatim
        # (SimpleDataSourceStreamReader is the driver-prefetch API —
        # right for a control-plane-sized store; a high-volume stream
        # would use DataSourceStreamReader with real input partitions)
        seen = set(self._delivered(start))
        fresh = [n for n in self._shard_names() if n not in seen]
        end = {"delivered": sorted(seen | set(fresh))}
        return list(self._rows(fresh)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(self._delivered(start))
        names = [n for n in end.get("delivered", []) if n not in seen]
        return list(self._rows(names))


class _Commit(WriterCommitMessage):
    def __init__(self, tmp_path: str, part_key: str):
        self.tmp_path = tmp_path
        self.part_key = part_key


class ItemStoreWriter(DataSourceWriter):
    """Append/overwrite writer with task-temp staging.

    Tasks write to uniquely-named ``.tmp`` files (job uuid + partition
    id — concurrent/repeated appends never collide); ``commit`` renames
    them to visible ``shard-<seq>-<job>-<pid>.jsonl`` names where
    ``<seq>`` is a zero-padded sequence assigned *at commit time* as
    max(existing)+1 — every committed shard therefore sorts strictly
    after all shards visible before the commit, the monotonicity the
    stream reader's name ordering relies on.  Overwrite mode removes
    pre-existing shards first; ``abort`` deletes the temps, so a failed
    job leaves nothing visible.
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
        tmp = os.path.join(
            self.path, f"part-{self.job_id}-{pid:05d}.tmp"
        )
        with open(tmp, "w") as fh:
            for row in rows:
                fh.write(json.dumps(row.asDict()) + "\n")
        return _Commit(tmp, f"{pid:05d}")

    # part_key orders shards within a commit; the sequence prefix
    # assigned in commit() orders commits against each other

    def _next_seq(self) -> int:
        seq = 0
        for f in os.listdir(self.path):
            if f.startswith("shard-") and f.endswith(".jsonl"):
                head = f.split("-", 2)[1]
                if head.isdigit():
                    seq = max(seq, int(head) + 1)
        return seq

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        seq = self._next_seq()
        # deterministic rename order (by partition id) so a reader
        # listing mid-commit never sees shard k+1 before shard k
        for m in sorted(messages, key=lambda m: m.part_key):
            final = os.path.join(
                self.path,
                f"shard-{seq:012d}-{self.job_id}-{m.part_key}.jsonl",
            )
            os.rename(m.tmp_path, final)
            seq += 1

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
