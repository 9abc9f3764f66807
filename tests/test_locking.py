"""M6/F12/F13 lock-protocol twin (operators/locking.py)."""

import random
import string

import pytest

from pyanamo_spark.operators import locking


class TestRandomLockID:
    def test_length_and_alphabet(self):
        """F12 contract (modifier.py:42): 30 chars, alnum only."""
        rng = random.Random(7)
        for _ in range(50):
            tok = locking.random_lock_id(rng)
            assert len(tok) == 30
            assert set(tok) <= set(string.ascii_letters + string.digits)

    def test_seeded_reproducible_and_collision_free(self):
        a = [locking.random_lock_id(random.Random(123)) for _ in range(3)]
        assert a[0] == a[1] == a[2]
        distinct = {locking.random_lock_id(random.Random(s)) for s in range(200)}
        assert len(distinct) == 200


@pytest.mark.usefixtures("spark")
class TestLockProtocol:
    def test_exactly_one_winner_per_contended_item(self, spark, sf_dir):
        """Last-writer-wins resolves every raced item to ONE owner
        (verifyItem, modifier.py:99-125): total wins == distinct items
        that had at least one attempt, and no worker wins more than it
        attempted."""
        from pyanamo_spark.registry import QUERIES

        rows = QUERIES["q_lock_protocol"](spark, sf_dir).collect()
        assert len(rows) == locking.LOCK_WORKERS
        for r in rows:
            assert 0 <= r.n_locked <= r.n_attempted
            # F13 jitter is 1..4 s per attempt
            assert r.n_attempted <= r.total_jitter_s <= 4 * r.n_attempted
            assert r.lock_digest == "" or len(r.lock_digest) == 30

        # cross-check: wins partition the attempted-item set
        from pyspark.sql import functions as F

        from pyanamo_spark import semantics

        semantics.ensure_views(spark, sf_dir)
        todo = spark.table("tasks").filter(F.col("ItemState") == "todo")
        workers = spark.range(locking.LOCK_WORKERS).select(
            F.concat(F.lit("sim-"), F.col("id").cast("string")).alias(
                "instance_id"
            )
        )
        key = F.concat(F.col("itemID"), F.lit("#"), F.col("instance_id"))
        attempted_items = (
            todo.select("itemID")
            .crossJoin(F.broadcast(workers))
            .filter(F.ascii(F.substring(F.md5(key), 1, 1)) % 2 == 0)
            .select("itemID")
            .distinct()
            .count()
        )
        assert sum(r.n_locked for r in rows) == attempted_items

    def test_deterministic(self, spark, sf_dir):
        from pyanamo_spark.registry import QUERIES

        q = QUERIES["q_lock_protocol"]
        h1 = sorted(map(tuple, q(spark, sf_dir).collect()))
        h2 = sorted(map(tuple, q(spark, sf_dir).collect()))
        assert h1 == h2
