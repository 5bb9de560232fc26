from .tables import TABLE_NAMES, load_table, load_tables, table_rows

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "table_rows"]
