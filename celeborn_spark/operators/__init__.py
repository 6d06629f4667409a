"""Reusable engine operators (DataFrame -> DataFrame combinators).

Query modules in celeborn_spark.queries declare the oracle-checked
surface; the generic, composable implementations live here.
"""
