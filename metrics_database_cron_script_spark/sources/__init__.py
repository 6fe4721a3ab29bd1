from metrics_database_cron_script_spark.sources.tables import (  # noqa: F401
    load_table,
    events_since,
    TABLES,
)
from metrics_database_cron_script_spark.sources.rest import rest_point_source  # noqa: F401
