from tvbigdataproject_spark.sources.io import (  # noqa: F401
    read_orc,
    read_table,
    read_tables,
    read_tweets,
    save_graph,
    write_csv,
    write_orc,
    write_parquet,
)
