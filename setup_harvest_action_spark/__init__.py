"""setup_harvest_action_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL pipeline
``marine-term-translations/setup-harvest-action`` (a SPARQL→SQLite
vocabulary harvester, see ``/root/reference/harvest.py``), extended
with the LLM-data-pipeline operators (deduplication, similarity
search, multimodal columns, text analysis) that a 100 TB training
corpus pipeline needs.

Design rules (enforced throughout):
  * declarative DataFrame/SQL plans — Catalyst owns physical strategy;
  * built-in ``pyspark.sql.functions`` in hot paths (JVM, codegen);
  * Arrow-batched pandas UDFs only where built-ins can't express the
    semantics (MinHash, SimHash, vector top-k);
  * explicit broadcast of dimension tables, no driver-side row loops;
  * every operator exposed via the query catalog (``catalog.py``) with
    a DuckDB oracle where SQL-expressible.
"""

from setup_harvest_action_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
