from solrizer_spark.corpus.generator import (  # noqa: F401
    PAGES_SCHEMA,
    generate_page,
    write_corpus,
)
