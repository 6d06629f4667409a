"""Reusable engine operators (DataFrame -> DataFrame combinators).

Query modules in celeborn_spark.queries declare the oracle-checked
surface; the generic, composable implementations live here.
"""


def values_table(spark, rows, schema: str):
    """JVM LocalRelation from small LITERAL rows — the createDataFrame
    twin without the Python-RDD scan. spark.createDataFrame(list)
    parallelizes the rows into defaultParallelism Python tasks, each
    paying a Python-worker launch: measured r13, a 4-size literal grid
    cost a 32-task stage with 8.5 s of executor run time (~90 ms of it
    CPU) PER QUERY EXECUTION. A SQL VALUES clause parses to a
    LocalTableScan: no job, no Python workers, identical rows/types.

    ``schema`` is "name type, name type, ..." with type in
    {int, long, double, string}; every value must be an int, float,
    str, bool, or None.
    """

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, int):
            return f"{v}L"
        if isinstance(v, float):
            # repr round-trips the exact double; D-suffix keeps Spark
            # from parsing the literal as DECIMAL
            return f"{v!r}D"
        if isinstance(v, str):
            escaped = v.replace("\\", "\\\\").replace("'", "\\'")
            return f"'{escaped}'"
        raise TypeError(f"values_table: unsupported literal {v!r}")

    cols = [c.strip().split() for c in schema.split(",")]
    sql_types = {"int": "INT", "long": "BIGINT", "double": "DOUBLE",
                 "string": "STRING"}
    names = ", ".join(n for n, _ in cols)
    casts = ", ".join(
        f"CAST({n} AS {sql_types[t]}) AS {n}" for n, t in cols
    )
    vals = ", ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    return spark.sql(f"SELECT {casts} FROM VALUES {vals} AS t({names})")
