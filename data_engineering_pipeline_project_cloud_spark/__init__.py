"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ELT pipeline
(``renzoorlandini/data-engineering-pipeline-project-cloud``), plus the
LLM-training-data-pipeline operator surface (dedup, similarity search,
text analysis, multimodal column plumbing) designed for 100 TB scale.

Design rules (see SURVEY.md §7):
 - DataFrame/SQL declarative plans; Catalyst + AQE do physical planning.
 - No driver-side materialization: every operator returns a lazy DataFrame.
 - Explicit schemas; decimal money; partitioned Parquet at rest.
 - Python UDFs only as Arrow-batched pandas UDFs, never row-at-a-time,
   and only where built-in functions cannot express the semantics.
"""

__version__ = "0.1.0"


def graft_sql(spark, statement):
    """SQL statement front-end (lazy alias for
    ``statements.graft_sql`` — see that module's docstring for the
    grammar)."""
    from .statements import graft_sql as _impl

    return _impl(spark, statement)


def graft_sql_script(spark, script, group=None):
    """Multi-statement script executor with transactional BEGIN ...
    COMMIT spans (lazy alias for ``statements.graft_sql_script``)."""
    from .statements import graft_sql_script as _impl

    return _impl(spark, script, group=group)
