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
        description="MovieLens rankings (reference-parity CLI)",
    )
    p.add_argument("pipeline", choices=["rank", "rating"])
    p.add_argument("movies_csv")
    p.add_argument("ratings_csv")
    p.add_argument("out_dir")
    p.add_argument(
        "--ascending",
        action="store_true",
        help="reference-exact ascending order (default: README-intent desc)",
    )
    p.add_argument(
        "--reducers",
        type=int,
        default=None,
        help="shuffle partition count (reference's setNumReduceTasks)",
    )
    return p


def run(argv: list[str] | None = None, spark=None) -> str:
    """Execute one pipeline; returns the output path (``<out>/final``)."""
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
