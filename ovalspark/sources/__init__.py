from ovalspark.sources.tables import (  # noqa: F401
    CATALOG_DDL,
    DOCS_DDL,
    TableSet,
    read_table,
    register_bucketed,
    write_bucketed,
    write_table,
)
