"""Spark execution layer: builds sketch states over DataFrames.

Execution model (SURVEY.md §3.2, improved): the build pass is
``mapInArrow`` — one streaming pass over each input partition producing one
tiny serialized state per (partition × group × sketch). Raw rows are NEVER
shuffled; only KB-sized states move in the single ``groupBy`` merge stage.
This is map-side partial aggregation taken to its limit and is the property
that makes the design hold at 10^12 sequences: the shuffle volume is
O(partitions × groups × state_size), independent of corpus size.
"""

from sketchlib.spark.build import (  # noqa: F401
    SketchSpec,
    build_sketches,
    merge_states,
    register_sketch_kind,
)
from sketchlib.spark.query import (  # noqa: F401
    estimates_df,
    exact_rescore_topk,
    intersection_estimate,
    load_states,
    quantiles_df,
    spectrum_df,
    topk_df,
    union_estimate,
)
from sketchlib.spark.scan import build_sketches_from_parquet  # noqa: F401
from sketchlib.spark.session import get_spark  # noqa: F401
from sketchlib.spark.subsample import (  # noqa: F401
    subsample_agg_from_uniform_sample,
    subsample_bivariate_from_uniform_sample,
    subsample_count_distinct_from_universe_sample,
    subsample_percentile_from_uniform_sample,
)
