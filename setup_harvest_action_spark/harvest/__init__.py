from setup_harvest_action_spark.harvest.field_mappings import (
    FIELD_MAPPINGS,
    field_mappings_df,
)
from setup_harvest_action_spark.harvest.normalize import unpivot_bindings
from setup_harvest_action_spark.harvest.load import HarvestState, LoadStats, harvest_batch
from setup_harvest_action_spark.harvest.validate import validate_collection_uri

__all__ = [
    "FIELD_MAPPINGS",
    "field_mappings_df",
    "unpivot_bindings",
    "HarvestState",
    "LoadStats",
    "harvest_batch",
    "validate_collection_uri",
]
