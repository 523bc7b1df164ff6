"""Dump .explain("formatted") output for named queries to plans/<round>/.

The optimization-round deliverable: plans/r15/<query>_before.txt and
..._after.txt — the judge checks plan claims (Exchange counts, join
strategies, Arrow vs row-at-a-time Python nodes) against these files.

Resolves names from __spark_entry__.queries() first, then from
bench.py's _queries()/_stress_queries() (the benchmark's own query
builders). Run from the repo checkout whose plans you want (a worktree
at the previous round's HEAD for the *_before set).

Usage:
  python scripts/dump_plans.py <out_dir> <suffix> <name> [name ...]
e.g.
  python scripts/dump_plans.py plans/r15 after \
      sim_embedding_near_dup dedup_minhash_lsh
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.01")


def _explain_formatted(df) -> str:
    """Capture df.explain(mode="formatted") via stdout redirect — the
    public API (ADVICE r15: the old df._sc._jvm.PythonSQLUtils call
    depended on private internals that drift across Spark versions)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> int:
    if len(sys.argv) < 4:
        print("usage: python scripts/dump_plans.py <out_dir> <suffix> "
              "<name> [name ...]", file=sys.stderr)
        return 2
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    import bench
    from aresdb_spark import get_spark

    spark = get_spark(app_name=f"dump-plans-{suffix}", cpus=8,
                      shuffle_partitions=8)
    builders = dict(bench._queries())
    builders.update(bench._stress_queries())
    builders.update(entry.queries())          # entry names win on clash

    rc = 0
    for name in names:
        if name not in builders:
            print(f"MISSING builder: {name}")
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = builders[name](spark, SF_DIR)
            plan = _explain_formatted(df)
        except Exception as e:  # noqa: BLE001 — record, keep going
            plan = f"PLAN UNAVAILABLE: {type(e).__name__}: {e}\n"
            rc = 1
        with open(path, "w") as f:
            f.write(f"== {name} ({suffix}) @ {SF_DIR} ==\n\n{plan}")
        print(f"wrote {path} ({len(plan)} chars)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
