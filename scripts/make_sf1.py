"""Synthesize sf1-scale fixtures from the read-only sf0.1 set.

/root/testdata is read-only and ships no sf1, but the 100 TB design
claims (bounded-memory percentiles, banded dedup, partition-pruned
ANN, one-pass curation) deserve at least one order-of-magnitude
empirical check. This script scales the four tables the hot LLM-path
queries read by 10× into ``<repo>/.fixtures/sf1`` (gitignored):

- documents ×10: copy 0 verbatim; later copies word-perturb ~1 in 3
  texts with a copy-specific token and leave 1 in 10 verbatim, so
  near-dup density and cross-copy exact dups stay realistic instead
  of degenerating into 10 disjoint corpora or one giant dup cluster
- embeddings ×10: seeded Gaussian jitter (σ=0.02) around the originals
  with labels kept — cluster structure survives, vectors don't repeat
- events ×10: ids/user offsets for half the copies (more users), same
  users with day-shifted timestamps for the other half (deeper
  per-user history) — both growth directions a stream table has
- lineitem ×10: orderkey-offset copies with hash-jittered quantities
  and prices (so percentile work isn't 10 identical distributions)

Dimension tables are copied verbatim. Everything is seeded and
rerun-stable. Run: python scripts/make_sf1.py [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
COPIES = 10


def synth_documents(con, src: str, out: Path) -> None:
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{src}/documents.parquet' "
        f"ORDER BY doc_id"
    ).fetchall()
    base = max(r[0] for r in rows) + 1
    rng = np.random.default_rng(420)
    out_rows = []
    for copy in range(COPIES):
        for doc_id, text, lang, source in rows:
            if copy == 0:
                out_rows.append((doc_id, text, lang, source, len(text)))
                continue
            new_id = doc_id + copy * base
            draw = rng.random()
            if draw < 0.10:
                new_text = text  # verbatim cross-copy duplicate
            elif draw < 0.43:
                words = text.split()
                if words:
                    k = int(rng.integers(0, len(words)))
                    words[k] = f"tok{copy}x{k}"
                new_text = " ".join(words)
            else:
                new_text = f"{text} c{copy}"
            out_rows.append((new_id, new_text, lang, source, len(new_text)))
    con.execute("CREATE OR REPLACE TABLE _docs(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO _docs VALUES (?,?,?,?,?)", out_rows)
    con.execute(f"COPY _docs TO '{out}/documents.parquet' (FORMAT PARQUET)")
    print(f"documents: {len(out_rows)} rows")


def synth_embeddings(con, src: str, out: Path) -> None:
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    base = max(r[0] for r in rows) + 1
    rng = np.random.default_rng(421)
    ids, vecs, labels = [], [], []
    for copy in range(COPIES):
        for vec_id, emb, label in rows:
            v = np.asarray(emb, dtype=np.float32)
            if copy:
                v = v + rng.normal(0.0, 0.02, v.shape).astype(np.float32)
            ids.append(vec_id + copy * base)
            vecs.append(v.tolist())
            labels.append(label)
    con.execute("CREATE OR REPLACE TABLE _emb(vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany(
        "INSERT INTO _emb VALUES (?,?,?)", list(zip(ids, vecs, labels))
    )
    con.execute(f"COPY _emb TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    print(f"embeddings: {len(ids)} rows")


def synth_events(con, src: str, out: Path) -> None:
    con.execute(f"CREATE OR REPLACE VIEW _ev AS SELECT * FROM '{src}/events.parquet'")
    base_id = con.sql("SELECT max(event_id)+1 FROM _ev").fetchone()[0]
    base_user = con.sql("SELECT max(user_id)+1 FROM _ev").fetchone()[0]
    selects = []
    for c in range(COPIES):
        if c == 0:
            selects.append("SELECT * FROM _ev")
        elif c % 2 == 0:  # new user population, same window
            selects.append(
                f"SELECT event_id + {c * base_id} AS event_id, ts, "
                f"user_id + {c * base_user} AS user_id, event_type, "
                f"value * (1.0 + 0.01 * {c}) AS value, props FROM _ev"
            )
        else:  # same users, shifted window (deeper history)
            selects.append(
                f"SELECT event_id + {c * base_id} AS event_id, "
                f"ts + INTERVAL {c} DAY AS ts, user_id, event_type, "
                f"value * (1.0 - 0.01 * {c}) AS value, props FROM _ev"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) "
        f"TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    print("events:", con.sql(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0], "rows")


def synth_lineitem(con, src: str, out: Path) -> None:
    con.execute(f"CREATE OR REPLACE VIEW _li AS SELECT * FROM '{src}/lineitem.parquet'")
    base = con.sql("SELECT max(l_orderkey)+1 FROM _li").fetchone()[0]
    selects = []
    for c in range(COPIES):
        if c == 0:
            selects.append("SELECT * FROM _li")
        else:
            # hash-jitter quantities/prices so each copy's distribution
            # shifts slightly (percentiles see 6M distinct-ish values,
            # not 10 stacked copies of one distribution)
            selects.append(
                f"SELECT l_orderkey + {c * base} AS l_orderkey, l_partkey, "
                f"l_suppkey, l_linenumber, "
                f"least(50.0, l_quantity + (CAST(hash(l_orderkey * 31 + {c}) % 7 AS BIGINT)) * 0.5) AS l_quantity, "
                f"l_extendedprice * (1.0 + ((CAST(hash(l_orderkey + {c}) % 100 AS BIGINT)) - 50) / 1000.0) AS l_extendedprice, "
                f"l_discount, l_tax, l_returnflag, l_linestatus, "
                f"l_shipdate + INTERVAL ({c} % 5) DAY AS l_shipdate FROM _li"
            )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) "
        f"TO '{out}/lineitem.parquet' (FORMAT PARQUET)"
    )
    print("lineitem:", con.sql(f"SELECT count(*) FROM '{out}/lineitem.parquet'").fetchone()[0], "rows")


def main() -> None:
    out = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else Path(__file__).resolve().parent.parent / ".fixtures" / "sf1"
    )
    if (out / "lineitem.parquet").exists():
        print(f"{out} already populated; delete to regenerate")
        return
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for dim in ("region", "nation", "customer", "supplier", "part", "orders"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
            f"TO '{out}/{dim}.parquet' (FORMAT PARQUET)"
        )
    synth_documents(con, SRC, out)
    synth_embeddings(con, SRC, out)
    synth_events(con, SRC, out)
    synth_lineitem(con, SRC, out)
    print(f"sf1 fixtures ready at {out}")


if __name__ == "__main__":
    main()
