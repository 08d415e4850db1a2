from raqc_spark.sources.table_adapter import TableAdapter
from raqc_spark.sources.testdata import TESTDATA_TABLES, load_table

__all__ = ["TableAdapter", "TESTDATA_TABLES", "load_table"]
