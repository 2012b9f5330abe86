"""search_engine_spark — a PySpark-native full-text index + BM25 engine.

Rebuilds, from scratch and Spark-idiomatically, the query and
data-processing capabilities of the reference single-node IR engine
(glennga/search-engine): tokenize -> score -> index pipeline, BM25
(k1=1.2, b=0.75) top-k by posting-list intersection, plus the scale
machinery the reference never needed (salted repartition for stopword
skew, delta-gap + varint compressed posting segments, block-max WAND,
checkpoint/resume with per-partition lineage manifests).

Provenance: the reference checkout at /root/reference was EMPTY at
survey time (SURVEY.md section 0), so canonical semantics are frozen by
this repo's own spec + pytest goldens, tagged [PK] in SURVEY.md. No
file:line citation into the reference can be made honestly yet; the
re-verification protocol in SURVEY.md section 0 governs the swap-in.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
