from metrics_database_cron_script_spark.plans.registry import (  # noqa: F401
    QUERIES,
    ORACLES,
    query,
    all_queries,
    all_oracles,
)

# Importing the query modules populates the registry.
from metrics_database_cron_script_spark.plans import queries_reference  # noqa: F401,E402
from metrics_database_cron_script_spark.plans import queries_relational  # noqa: F401,E402
from metrics_database_cron_script_spark.plans import queries_tpch  # noqa: F401,E402
from metrics_database_cron_script_spark.plans import queries_streaming  # noqa: F401,E402
from metrics_database_cron_script_spark.plans import queries_llm  # noqa: F401,E402
