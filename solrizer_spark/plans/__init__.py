from solrizer_spark.plans.pipeline import (  # noqa: F401
    DEFAULT_CHAIN,
    STAGES,
    build_pipeline,
    run_chain,
)
