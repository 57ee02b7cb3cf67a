from setup_harvest_action_spark.io.loaders import load_table, load_tables

__all__ = ["load_table", "load_tables"]
