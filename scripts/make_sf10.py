"""Synthesize sf10-scale fixtures (100x sf0.1) for the scale gate's
second data point (VERDICT r09 item 5).

One order of magnitude (make_sf1.py) supports the sublinearity claims;
two make the 100x extrapolation an interpolation for the worst sf1
scalers. Only the tables those five queries read are scaled —
``documents`` (q_chunk_documents / q_dedup_ngram / q_pdf_extract /
q_html_extract) and ``embeddings`` (q_dedup_embed); everything else is
copied verbatim so the fixture dir stays loadable.

The duplicate structure deliberately differs from make_sf1's: sf1's
10 copies form one ~10-clique per source doc, so true near-dup PAIRS
grow quadratically in the copy count — realistic at 10x, but 100
copies would make the OUTPUT itself 2500x (25M pairs), measuring
fixture construction rather than the engine. Real crawls grow the
NUMBER of duplicate clusters with corpus size, not the cluster size,
so sf10 structures its 100 copies as 10 GROUPS of 10:

- within a group, copies share a group-perturbed base text and differ
  by a copy suffix (plus 1-in-10 verbatim) — ~10-sized near-dup
  cliques, like sf1
- across groups, every third word is replaced with a group-specific
  token, so almost every trigram differs and cross-group Jaccard
  collapses — groups are distinct documents

True near-dup pairs therefore scale ~linearly (10x sf1's count at 10x
its size). Embeddings get the same treatment: group g rolls the
coordinates by g (a rolled vector is uncorrelated — cross-group cosine
~0) and jitters within the group (sigma=0.02, seeded), so embedding
near-dup cliques stay ~10-sized too.

Run: python scripts/make_sf10.py [out_dir]   (default
<repo>/.fixtures/sf10, gitignored)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
COPIES = 100
GROUP = 10  # copies per near-dup group


def synth_documents(con, src: str, out: Path) -> None:
    con.execute(
        f"CREATE OR REPLACE VIEW _d AS "
        f"SELECT * FROM '{src}/documents.parquet'"
    )
    base = con.sql("SELECT max(doc_id)+1 FROM _d").fetchone()[0]
    selects = []
    for c in range(COPIES):
        if c == 0:
            selects.append("SELECT * FROM _d")
            continue
        g = c // GROUP
        if g == 0:
            # group 0 keeps the original text (its base is copy 0)
            grouped = "text"
        else:
            # replace every third word with a group token: trigram
            # overlap with other groups collapses, within-group stays
            grouped = (
                f"array_to_string(list_transform(string_split(text, ' '),"
                f" (w, i) -> CASE WHEN (i % 3) = {g % 3}"
                f" THEN 'g{g}w' || (i % 97) ELSE w END), ' ')"
            )
        if c % GROUP == 0 and g > 0:
            # the group's verbatim base (one exact-dup seed per group)
            text_expr = grouped
        else:
            # copy-specific tail: high within-group Jaccard, distinct
            text_expr = f"{grouped} || ' c{c} tail{c % 7}'"
        selects.append(
            f"SELECT doc_id + {c * base} AS doc_id, {text_expr} AS text,"
            f" lang, source, len({text_expr}) AS n_chars FROM _d"
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) "
        f"TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    n = con.sql(
        f"SELECT count(*) FROM '{out}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents: {n} rows")


def synth_embeddings(con, src: str, out: Path) -> None:
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{src}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    base = max(r[0] for r in rows) + 1
    rng = np.random.default_rng(1042)
    ids, vecs, labels = [], [], []
    for c in range(COPIES):
        g = c // GROUP
        for vec_id, emb, label in rows:
            v = np.asarray(emb, dtype=np.float32)
            if g:
                v = np.roll(v, g)  # uncorrelated across groups
            if c % GROUP:
                v = v + rng.normal(0.0, 0.02, v.shape).astype(np.float32)
            ids.append(vec_id + c * base)
            vecs.append(v.tolist())
            labels.append(label)
    con.execute(
        "CREATE OR REPLACE TABLE _emb("
        "vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany(
        "INSERT INTO _emb VALUES (?,?,?)", list(zip(ids, vecs, labels))
    )
    con.execute(f"COPY _emb TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    print(f"embeddings: {len(ids)} rows")


def main() -> None:
    out = Path(
        sys.argv[1]
        if len(sys.argv) > 1
        else Path(__file__).resolve().parent.parent / ".fixtures" / "sf10"
    )
    if (out / "documents.parquet").exists():
        print(f"{out} already populated; delete to regenerate")
        return
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    # unscaled tables copy verbatim so the fixture dir stays loadable
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
    ):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    synth_documents(con, SRC, out)
    synth_embeddings(con, SRC, out)
    print(f"sf10 fixtures ready at {out}")


if __name__ == "__main__":
    main()
