"""axolotls_spark — a PySpark-native analytics engine with the
capability surface of wenleix/Axolotls, extended with the relational
and LLM-data-pipeline operator families, designed for 100 TB scale.

Layout:
- ``session``    SparkSession factory (AQE, Arrow, UTC, broadcast conf)
- ``io``         Parquet sources for the star schema + extension tables
- ``functions``  scalar/struct/array expression layer (reference parity)
- ``operators``  relational, dedup, similarity, text-analysis operators
- ``streaming``  batch time windows + structured-streaming operators
- ``multimodal`` binary-column plumbing (decode stubs, real Spark side)
- ``queries``    the named query registry backing __spark_entry__.py
"""

from axolotls_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
