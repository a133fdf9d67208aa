from solrizer_spark.streaming.incremental import stream_extract  # noqa: F401
