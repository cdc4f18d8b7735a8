from .tpch import TABLES, load_table, load_tables, register_views  # noqa: F401
from .activity import ACTIVITY_SCHEMA, read_activity_csv  # noqa: F401
