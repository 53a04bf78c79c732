"""Fused metrics derivation parity: metrics_from_events must equal the
unfused derive_turn_metrics(transcripts_from_events(...)) row-for-row."""

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.sources.transcripts import (
    metrics_from_events,
    transcripts_from_events,
)

SF = "/root/testdata/sf0.001"


def test_fused_metrics_match_unfused(spark):
    fused = metrics_from_events(spark, SF)
    unfused = derive_turn_metrics(transcripts_from_events(spark, SF))
    assert fused.columns == unfused.columns
    assert [f.dataType for f in fused.schema.fields] == [
        f.dataType for f in unfused.schema.fields
    ]
    ra = sorted(map(tuple, fused.collect()))
    rb = sorted(map(tuple, unfused.collect()))
    assert ra == rb
