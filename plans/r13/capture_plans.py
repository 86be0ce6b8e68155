"""Capture .explain("formatted") output for declared queries.

Usage: python plans/r13/capture_plans.py <out_suffix> <query> [query ...]

Writes plans/r13/<query>_<out_suffix>.txt for each query, using the
repo rooted at the CWD (run it from a worktree to capture "before"
plans). SF dir is sf0.01 — plan SHAPE is SF-independent for every
declared query (no AQE re-planning is captured here; this is the
static physical plan the judge compares).
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path.cwd()))

OUT_DIR = Path(__file__).resolve().parent


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from spark_relieffc_fselection_spark import get_spark

    import __spark_entry__ as entry

    spark = get_spark(shuffle_partitions=8)
    qs = entry.queries()
    sf_dir = "/root/testdata/sf0.01"
    for name in names:
        full = next((k for k in qs if k == name or k.startswith(name + "_")), None)
        if full is None:
            print(f"SKIP {name}: not in queries()")
            continue
        df = qs[full](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = OUT_DIR / f"{name}_{suffix}.txt"
        out.write_text(buf.getvalue())
        print(f"wrote {out} ({len(buf.getvalue())} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
