"""hunt_ray — a Ray-Data-native inverted-index build + top-k query engine.

A from-scratch rebuild of the capabilities of hunt-framework/hunt (a Haskell
full-text search platform; reference at /root/reference) on top of
``ray.data.Dataset`` pipelines: Arrow-batch analyzers in actor pools, a
groupby-term shuffle with explicit head-term salting for the posting-list
build, delta+varbyte-compressed postings in partitioned Parquet, and a query
engine with two scorers — ``hunt-compat`` (rank-identical to Hunt's scoring
algebra) and ``bm25`` (k1/b with max-score/block-max pruning).
"""

__version__ = "0.1.0"
