from metrics_database_cron_script_spark.sources.tables import load_table, TABLES  # noqa: F401
from metrics_database_cron_script_spark.sources.rest import rest_point_source  # noqa: F401
