"""Command-line entry point: ``python -m axolotls_spark <cmd>``.

Usability surface for the named-query registry — run any operator
against any scale directory, inspect its physical plan, or list the
inventory with tags. Mirrors how the driver exercises the engine
(``__spark_entry__``/``bench.py``), so what works here works there.

Commands:
  list [tag]              query names (optionally filtered by tag)
  run <name> [sf_dir]     execute and show the first rows
  explain <name> [sf_dir] formatted physical plan
  sql <query> [sf_dir]    ad-hoc Spark SQL over the registered views
  oracle <name>           print the query's DuckDB oracle SQL
"""

from __future__ import annotations

import sys


def _spark():
    from axolotls_spark.session import get_spark

    s = get_spark("axolotls-spark-cli")
    s.sparkContext.setLogLevel("ERROR")
    return s


def _resolve(REGISTRY: dict, rest: list[str], cmd: str):
    """Validate `<cmd> <name>` argv; print a usage error (with
    nearest-match suggestions) instead of a raw KeyError/IndexError."""
    import difflib
    import sys as _sys

    if not rest:
        print(f"usage: python -m axolotls_spark {cmd} <query> [sf_dir]",
              file=_sys.stderr)
        return None
    name = rest[0]
    if name not in REGISTRY:
        close = difflib.get_close_matches(name, REGISTRY, n=5, cutoff=0.5)
        hint = f"; did you mean: {', '.join(close)}" if close else ""
        print(f"unknown query {name!r}{hint} (see `list`)", file=_sys.stderr)
        return None
    return name


def main(argv: list[str]) -> int:
    from axolotls_spark.queries import REGISTRY

    if not argv or argv[0] in {"-h", "--help"}:
        print(__doc__)
        return 0
    cmd, *rest = argv
    default_sf = "/root/testdata/sf0.001"

    if cmd == "list":
        tag = rest[0] if rest else None
        for name in sorted(REGISTRY):
            spec = REGISTRY[name]
            if tag and tag not in spec.tags:
                continue
            mark = " " if spec.oracle else "~"  # ~ = rows-only check
            print(f"{mark} {name:<36} {', '.join(spec.tags)}")
        return 0

    if cmd == "oracle":
        name = _resolve(REGISTRY, rest, cmd)
        if name is None:
            return 2
        print(REGISTRY[name].oracle or "(rows-only: no SQL oracle)")
        return 0

    if cmd in {"run", "explain"}:
        name = _resolve(REGISTRY, rest, cmd)
        if name is None:
            return 2
        sf_dir = rest[1] if len(rest) > 1 else default_sf
        df = REGISTRY[name].fn(_spark(), sf_dir)
        if cmd == "run":
            df.show(20, truncate=False)
        else:
            df.explain("formatted")
        return 0

    if cmd == "sql":
        if not rest:
            print("usage: python -m axolotls_spark sql <query> [sf_dir]",
                  file=sys.stderr)
            return 2
        query = rest[0]
        sf_dir = rest[1] if len(rest) > 1 else default_sf
        from axolotls_spark.io.sources import register_views

        spark = _spark()
        register_views(spark, sf_dir)
        spark.sql(query).show(20, truncate=False)
        return 0

    print(f"unknown command {cmd!r}; see --help", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
