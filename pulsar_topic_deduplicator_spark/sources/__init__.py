from .io import TABLES, load_table, messages_view

__all__ = ["TABLES", "load_table", "messages_view"]
