from .tables import load_table, register_views, table_path

__all__ = ["load_table", "register_views", "table_path"]
