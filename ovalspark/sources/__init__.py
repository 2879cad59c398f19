from ovalspark.sources.tables import TableSet, read_table, write_table  # noqa: F401
