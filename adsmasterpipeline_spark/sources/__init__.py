from .testdata import (TABLES, bibcode_list, load_table, load_tables,
                       register_views)

__all__ = ["TABLES", "bibcode_list", "load_table", "load_tables",
           "register_views"]
