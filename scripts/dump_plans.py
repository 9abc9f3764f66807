"""Dump ``explain("formatted")`` for named queries to one file each —
the per-round plan evidence (plans/r{N}/<query>_{before,after}.txt).

Run: SPARK_GRAFT_CPUS=8 python scripts/dump_plans.py OUTDIR SUFFIX q_a q_b ...
  OUTDIR  directory to write into (created if absent)
  SUFFIX  appended to the file name: <query>_<SUFFIX>.txt
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Ran from a git worktree of an older commit, it captures that commit's
plans — how the "before" files of an optimization round are made.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyanamo_spark.registry import QUERIES, load_all  # noqa: E402
from pyanamo_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, names = Path(sys.argv[1]), sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir.mkdir(parents=True, exist_ok=True)
    load_all()
    spark = get_spark("pyanamo-spark-dump-plans")
    import contextlib
    import io

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = outdir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} B)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
