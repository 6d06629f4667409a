"""Query modules — each registers its operators via celeborn_spark.registry."""
