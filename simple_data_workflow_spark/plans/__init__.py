from simple_data_workflow_spark.plans.pipeline import e2e_pipeline, PipelineResult  # noqa: F401
