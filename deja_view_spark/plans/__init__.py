from deja_view_spark.plans.pipeline import KGPipeline  # noqa: F401
