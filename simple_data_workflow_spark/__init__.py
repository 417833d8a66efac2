"""simple_data_workflow_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference `topher-lo/simple-data-workflow` (a Prefect 1.x + pandas
statistics workflow; see SURVEY.md), widened to relational/OLAP
coverage and LLM-training-data operators (dedup, similarity search,
text analysis, multimodal columns).

Design stance (SURVEY.md §7.0):
- every operator is a composable ``DataFrame -> DataFrame`` function;
- the lazy Spark logical plan *is* the pipeline DAG (the reference's
  Prefect Flow analogue, reference src/flow.py:19-52);
- no ``collect()`` of data-sized results — global statistics come back
  as one tiny aggregate row broadcast back into the plan;
- built-in `pyspark.sql.functions` everywhere; Pandas UDFs only where
  built-ins genuinely can't express the semantics (MICE, multimodal
  decode).
"""

__version__ = "0.1.0"

from simple_data_workflow_spark.session import get_spark  # noqa: F401
