"""medacy_spark — a PySpark-native medical knowledge-graph construction engine.

A from-scratch Spark DataFrame re-expression of the query/data-processing
capabilities of NLPatVCU/medaCy (reference, read-only, at /root/reference):
corpus management, annotation algebra, feature pipelines, mention detection,
relation extraction, entity linking, canonicalization, and evaluation —
designed for Iceberg-style tables of Common-Crawl-scale web pages.

Nothing in this package is a port: the reference is a single-node,
file-at-a-time Python framework; this engine declares logical plans with the
DataFrame API and lets Catalyst/Tungsten pick physical strategies. Pandas
(Arrow-batched) UDFs appear only where built-in operators cannot express the
semantics (HTML text extraction, model scoring).
"""

__version__ = "0.1.0"
