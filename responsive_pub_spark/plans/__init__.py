"""Plan introspection & audit (SURVEY.md §4: the reference's
StreamsBytecodeAnalyzer analog is Spark plan introspection)."""
