"""Scalar-function library (text, hashing, vectors).

The reference has no scalar-function library at all — keys/values are opaque
bytes and all such logic lives in user lambdas (SURVEY.md §2.2). Spark's
built-in ``pyspark.sql.functions`` supersets that surface; this package adds
the LLM-data-pipeline primitives (portable hashing, shingling, minhash,
simhash, language id, quality scoring, vector math) implemented twice from
one set of constants: as Spark Column expressions (JVM-side, codegen-friendly)
and as ANSI-SQL strings for the DuckDB correctness oracle.
"""
