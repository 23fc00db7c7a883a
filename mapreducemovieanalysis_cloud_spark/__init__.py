"""mapreducemovieanalysis_cloud_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference repo ``tnaimisha/MapreduceMovieAnalysis-Cloud``
(two Hadoop-MapReduce movie-analytics pipelines; see SURVEY.md), widened to the
full relational operator surface, structured streaming, and the LLM-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) that a 100 TB training-data pipeline needs.

Design principles (SURVEY.md §1.4, §4):

- DataFrame/SQL first: every operator is a declarative Catalyst plan; no RDDs.
- Broadcast the provably-small side (the reference's DistributedCache HashMap
  join, ``MovieRank.java:30-51``, becomes ``F.broadcast``).
- One lazy DAG instead of the reference's two jobs staged through HDFS text
  (``MovieRank.java:169,194``).
- Python only in Arrow-vectorized ``pandas_udf`` / ``applyInPandas`` stages,
  and only where built-ins cannot express the semantics.
"""

from mapreducemovieanalysis_cloud_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
