"""Reference-exact semantics on MovieLens-shaped fixtures (SURVEY §5.3).

The fixture reproduces every edge case the reference's parse/agg code paths
reveal: titles containing commas (MovieRank.java:44-47), groups straddling
the strict HAVING cuts (MovieRating.java:96-101), count/avg ties
(MovieRank.java:132-143), and a ratings row whose movieId is absent from
movies (the '"null"-title' wart, MovieRank.java:67-70 — engine semantics:
inner join drops it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators.reference import (
    rank_by_avg,
    rank_by_count,
)
from mapreducemovieanalysis_cloud_spark.sources.readers import read_movielens_csv
from mapreducemovieanalysis_cloud_spark.sources.writers import write_table

MOVIES_CSV = """movieId,title,genres
1,"Shawshank Redemption, The (1994)",Crime|Drama
2,Toy Story (1995),Animation|Comedy
3,Heat (1995),Action|Crime
4,"Usual Suspects, The (1995)",Crime|Thriller
5,Exactly Four (2000),Drama
6,Tie A (2001),Drama
7,Tie B (2001),Comedy
"""

# per movie: (movieId, n_ratings, ratings)
#  1 → 12 ratings avg 4.5   (passes both cuts)
#  2 → 11 ratings avg 4.0   (passes count cut, avg exactly 4.0 → cut by >4)
#  3 → 10 ratings avg 5.0   (count exactly 10 → cut by >10)
#  4 → 9  ratings avg 5.0   (cut)
#  5 → 12 ratings avg 4.0   (avg exactly 4.0 → cut)
#  6 → 12 ratings avg 4.5   (tie with movie 1 on count AND avg)
#  7 → 12 ratings avg 4.25
#  99 → 3 ratings, movieId absent from movies (join wart row)


def _ratings_csv() -> str:
    rows = ["userId,movieId,rating,timestamp"]
    uid = 1

    def add(movie: int, ratings: list[float]) -> None:
        nonlocal uid
        for r in ratings:
            rows.append(f"{uid},{movie},{r},{1100000000 + uid}")
            uid += 1

    add(1, [4.5] * 12)
    add(2, [4.0] * 11)
    add(3, [5.0] * 10)
    add(4, [5.0] * 9)
    add(5, [3.5, 4.5] * 6)  # avg exactly 4.0 over 12
    add(6, [4.0, 5.0] * 6)  # avg 4.5 over 12 — ties movie 1
    add(7, [4.0, 4.5] * 6)  # avg 4.25 over 12
    add(99, [5.0] * 3)  # no movies row
    return "\n".join(rows) + "\n"


@pytest.fixture(scope="module")
def movielens(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ml")
    (d / "movies.csv").write_text(MOVIES_CSV)
    (d / "ratings.csv").write_text(_ratings_csv())
    return read_movielens_csv(
        spark, str(d / "movies.csv"), str(d / "ratings.csv")
    )


def test_csv_quoting_preserves_comma_titles(movielens):
    movies, _ = movielens
    titles = {r.movieId: r.title for r in movies.collect()}
    # the reference's naive split would yield '"Shawshank Redemption' + ...
    assert titles[1] == "Shawshank Redemption, The (1994)"
    assert titles[4] == "Usual Suspects, The (1995)"
    # genres survives (the reference silently drops it)
    genres = {r.movieId: r.genres for r in movies.collect()}
    assert genres[1] == "Crime|Drama"


def test_header_handled_as_schema_not_filter(movielens):
    _, ratings = movielens
    assert ratings.count() == 12 + 11 + 10 + 9 + 12 + 12 + 12 + 3
    assert ratings.schema["rating"].dataType.typeName() == "double"


def test_movie_rank_counts_and_order(movielens):
    movies, ratings = movielens
    out = rank_by_count(
        ratings, movies, key="movieId", label="title", descending=False
    ).collect()
    counts = {r.title: r.num_reviews for r in out}
    assert counts["Shawshank Redemption, The (1994)"] == 12
    assert counts["Heat (1995)"] == 10
    # inner join: the movieId=99 ratings do NOT appear as title 'null'
    assert "null" not in {r.title for r in out}
    assert len(out) == 7
    # ascending count order (reference-exact), ties broken by movieId
    assert [r.num_reviews for r in out] == sorted(r.num_reviews for r in out)
    tied = [r for r in out if r.num_reviews == 12]
    assert [t.movieId for t in tied] == sorted(t.movieId for t in tied)


def test_movie_rating_having_cuts_are_strict(movielens):
    movies, ratings = movielens
    out = rank_by_avg(
        ratings,
        movies,
        key="movieId",
        label="title",
        measure="rating",
        min_count=10,
        min_avg=4.0,
        measure_decimals=1,
        descending=True,
    ).collect()
    titles = {r.title for r in out}
    assert "Shawshank Redemption, The (1994)" in titles  # 12 @ 4.5
    assert "Toy Story (1995)" not in titles  # avg exactly 4.0 → strict >
    assert "Heat (1995)" not in titles  # count exactly 10 → strict >
    assert "Exactly Four (2000)" not in titles  # avg exactly 4.0
    assert "Tie A (2001)" in titles and "Tie B (2001)" in titles
    # descending avg, deterministic tie order
    avgs = [r.avg_rating for r in out]
    assert avgs == sorted(avgs, reverse=True)
    assert {r.title for r in out if r.avg_rating == 4.5} == {
        "Shawshank Redemption, The (1994)",
        "Tie A (2001)",
    }


def test_avg_values_exact(movielens):
    movies, ratings = movielens
    out = {
        r.title: (r.avg_rating, r.num_ratings)
        for r in rank_by_avg(
            ratings, movies, "movieId", "title", "rating",
            min_count=0, min_avg=0.0, measure_decimals=1,
        ).collect()
    }
    assert out["Toy Story (1995)"] == (4.0, 11)
    assert out["Tie B (2001)"] == (4.25, 12)


def test_tab_separated_text_sink_roundtrip(spark, movielens, tmp_path):
    """S4: the reference's key\\tvalue text output, as a proper CSV sink."""
    movies, ratings = movielens
    out = rank_by_count(ratings, movies, "movieId", "title", descending=False)
    path = str(tmp_path / "final")
    write_table(out, path, fmt="csv", sep="\t")
    back = (
        spark.read.options(header="true", sep="\t")
        .schema(out.schema)
        .csv(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, out.collect())
    )


def test_malformed_rows_do_not_throw(spark, tmp_path):
    """The reference throws on malformed rows (Integer.parseInt,
    MovieRank.java:43); the engine lands them as nulls (PERMISSIVE)."""
    p = tmp_path / "bad.csv"
    p.write_text(
        "userId,movieId,rating,timestamp\n"
        "1,1,4.5,1100000000\n"
        "oops,not,a,row\n"
        "2,2,3.0,1100000001\n"
    )
    from mapreducemovieanalysis_cloud_spark import schemas
    from mapreducemovieanalysis_cloud_spark.sources.readers import read_any

    df = read_any(spark, str(p), "csv", schema=schemas.RATINGS)
    rows = df.collect()
    assert len(rows) == 3  # malformed row present as nulls, not an exception
    good = [r for r in rows if r.movieId is not None]
    assert len(good) == 2


def test_cli_reference_invocation(spark, tmp_path):
    """The reference's operational entry: positional (movies, ratings, out)
    args, tab-separated text in <out>/final (MovieRank.java:149-156)."""
    from mapreducemovieanalysis_cloud_spark import cli

    (tmp_path / "movies.csv").write_text(MOVIES_CSV)
    (tmp_path / "ratings.csv").write_text(_ratings_csv())
    out = cli.run(
        [
            "rating",
            str(tmp_path / "movies.csv"),
            str(tmp_path / "ratings.csv"),
            str(tmp_path / "out"),
            "--reducers",
            "4",
        ],
        spark=spark,
    )
    lines = [
        ln
        for f in (tmp_path / "out" / "final").glob("part-*")
        for ln in f.read_text().splitlines()
    ]
    # movies 1 and 6 pass both strict cuts (avg 4.5, count 12); 7 passes
    # (4.25); 2/3/4/5 are cut (SURVEY §5.3 fixture design)
    assert len(lines) == 3
    assert all(len(ln.split("\t")) == 3 for ln in lines)
    titles = [ln.split("\t")[0] for ln in lines]
    assert set(titles) == {
        "Shawshank Redemption, The (1994)", "Tie A (2001)", "Tie B (2001)"
    }


def test_cli_generic_query_runner(spark, tmp_path, sf_dir):
    """`cli query <name> <out>` runs any registered query and writes its
    result — the operational entry for the widened engine surface."""
    from mapreducemovieanalysis_cloud_spark import cli

    out = cli.run(
        [
            "query",
            "tpch_q1_pricing_summary",
            str(tmp_path / "q1_out"),
            "--sf-dir",
            sf_dir,
        ],
        spark=spark,
    )
    got = spark.read.parquet(out)
    assert got.count() > 0
    assert "sum_qty_cents" in got.columns
