from solrizer_spark.sources.pages import read_pages, write_table  # noqa: F401
