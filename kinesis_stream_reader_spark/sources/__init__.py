from .tables import TABLES, load_events, load_table  # noqa: F401
