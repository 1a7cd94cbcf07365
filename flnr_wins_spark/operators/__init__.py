from flnr_wins_spark.operators.append import align_to_schema, append_no_test
from flnr_wins_spark.operators.enrich import enrich
from flnr_wins_spark.operators.frequency import frequency
from flnr_wins_spark.operators.reject import reject_duplicates, reject_unmatched
from flnr_wins_spark.operators.update import blank_to_null, conditional_update

__all__ = [
    "align_to_schema",
    "append_no_test",
    "blank_to_null",
    "conditional_update",
    "enrich",
    "frequency",
    "reject_duplicates",
    "reject_unmatched",
]
