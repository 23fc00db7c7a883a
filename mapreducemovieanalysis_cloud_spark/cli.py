"""Command-line entry mirroring the reference's operational surface.

The reference is run as ``hadoop jar ... [reducers] movies.csv reviews out``
(``MovieRank.java:149-156``, ``README.md:17-28``); a user switches to this
engine with the same positional arguments:

    python -m mapreducemovieanalysis_cloud_spark.cli rank   m.csv r.csv out/
    python -m mapreducemovieanalysis_cloud_spark.cli rating m.csv r.csv out/

Output lands in ``<out>/final`` as tab-separated text — the reference's
``TextOutputFormat`` shape (``MovieRank.java:169-171``): ``count\\ttitle``
for rank, ``title\\tavg\\tcount`` for rating. ``--ascending`` reproduces the
reference-exact MR shuffle order instead of the README's descending intent;
``--reducers`` maps to shuffle partitions (the reference's
``setNumReduceTasks`` knob, C2 in SURVEY §2.1).

Beyond reference parity, every registered engine query is operationally
invokable:

    python -m mapreducemovieanalysis_cloud_spark.cli query curate_corpus out/ \\
        --sf-dir /data/sf1 --format parquet
"""

from __future__ import annotations

import argparse

from mapreducemovieanalysis_cloud_spark.operators.reference import (
    rank_by_avg,
    rank_by_count,
)
from mapreducemovieanalysis_cloud_spark.session import get_session
from mapreducemovieanalysis_cloud_spark.sources.readers import (
    read_movielens_csv,
)
from mapreducemovieanalysis_cloud_spark.sources.writers import write_table


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mapreducemovieanalysis_cloud_spark",
        description="MovieLens rankings (reference-parity CLI) + engine queries",
    )
    p.add_argument(
        "--reducers",
        type=int,
        default=None,
        help="shuffle partition count (reference's setNumReduceTasks)",
    )
    sub = p.add_subparsers(dest="pipeline", required=True)
    for name in ("rank", "rating"):
        sp = sub.add_parser(name, help=f"reference {name} pipeline")
        sp.add_argument("movies_csv")
        sp.add_argument("ratings_csv")
        sp.add_argument("out_dir")
        sp.add_argument(
            "--ascending",
            action="store_true",
            help="reference-exact ascending order (default: README-intent desc)",
        )
        sp.add_argument("--reducers", type=int, default=None)
    q = sub.add_parser("query", help="run any registered engine query")
    q.add_argument("name", help="registry query name (see registry.queries())")
    q.add_argument("out_dir")
    q.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory holding the driver parquet tables",
    )
    q.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "csv", "json", "orc"],
        help="output format",
    )
    q.add_argument("--reducers", type=int, default=None)
    return p


def run(argv: list[str] | None = None, spark=None) -> str:
    """Execute one pipeline; returns the output path."""
    args = build_parser().parse_args(argv)
    if spark is None:
        spark = get_session(
            app_name=f"movielens-{args.pipeline}",
            shuffle_partitions=args.reducers,
        )
    if args.reducers is not None:
        # getOrCreate() silently ignores builder conf when a session already
        # exists in the JVM; shuffle partitions are runtime-mutable, so set
        # them on the live session to make the knob reliable either way.
        spark.conf.set("spark.sql.shuffle.partitions", str(args.reducers))
    if args.pipeline == "query":
        from mapreducemovieanalysis_cloud_spark import registry

        queries = registry.queries()
        if args.name not in queries:
            raise SystemExit(
                f"unknown query {args.name!r}; one of {sorted(queries)}"
            )
        result = queries[args.name](spark, args.sf_dir)
        out = args.out_dir.rstrip("/")
        write_table(result, out, fmt=args.format)
        return out
    movies, ratings = read_movielens_csv(
        spark, args.movies_csv, args.ratings_csv
    )
    if args.pipeline == "rank":
        result = rank_by_count(
            ratings,
            movies,
            key="movieId",
            label="title",
            descending=not args.ascending,
        ).select("num_reviews", "title")  # <count \t title>
    else:
        result = rank_by_avg(
            ratings,
            movies,
            key="movieId",
            label="title",
            measure="rating",
            descending=not args.ascending,
        )  # <title \t avg \t count>
    out = f"{args.out_dir.rstrip('/')}/final"
    write_table(result, out, fmt="csv", sep="\t", header="false")
    return out


if __name__ == "__main__":  # pragma: no cover
    run()
