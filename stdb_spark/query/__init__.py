from stdb_spark.query.parser import QueryKind, QueryRequest, parse_query  # noqa: F401
