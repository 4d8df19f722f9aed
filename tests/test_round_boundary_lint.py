"""Static lint for the cross-engine round-half-boundary class.

The rule (functions/exact.py): a FINAL output column that is
``round(p/q, k)`` where p and q are INTEGER-EXACT must never be
computed through a double divide — Spark rounds the shortest decimal
repr HALF_UP, DuckDB rounds the binary double, and any exact rational
terminating at a (k+1)-digit '5' flips between them (four r5
driver-proven wrong answers). Integer-exact sites must go through
``sp_rat``/``dk_rat`` (or emit p and q).

This test scans every operator/source module for raw
``round(<expr with '/'>, k)`` occurrences and fails on any function not
in the allowlist below. Every allowlist entry carries its safety
category:

  IRRATIONAL — the expression passes through sqrt/ln/log/exp, so the
    value is irrational with a ~17-significant-digit shortest repr; a
    7-digit terminating repr cannot occur.
  EXACT_DP — the quotient has at most k decimal digits by construction
    (e.g. cents/100 at 6 dp, micros/1e6 at 6 dp, u2/2 at 6 dp), so
    round(x, k) is an identity on an exactly-representable value.
  FLOAT_DATA — the dividend is arbitrary double DATA (event values,
    embedding components), not an exact integer; the result is not an
    exact rational and both engines emit the same double.
  COMPOUND_RATIONAL — a float SUM of per-group rationals with differing
    denominators (chi-square-like forms): not expressible as one
    integer division; the accumulated float error means the value no
    longer terminates exactly, making a boundary hit measure-~zero.
    These are the documented residual-risk sites.

Adding a NEW raw round(<division>) site fails this test; either route
it through functions/exact.py or add it here WITH its category. Stale
entries (allowlisted but no longer matching) also fail, so the list
stays in sync with the code.
"""

from __future__ import annotations

import collections
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "navigator_data_ingest_spark"

MODULES = [
    "operators/analytics.py", "operators/corpus.py", "operators/dedup.py",
    "operators/textstats.py", "operators/similarity.py", "operators/graph.py",
    "operators/multimodal.py", "operators/ingest.py", "operators/fetch.py",
    "operators/layout.py", "operators/cdc.py", "sources/compact.py",
    "sources/flat.py", "sources/bucketed.py", "sources/dpp.py",
    "sources/publish.py", "sources/sinks.py", "sources/json_cache.py",
    "sources/partitioned.py", "sources/pipeline_updates.py",
    "sources/pysource.py", "streaming/streams.py",
]

PAT = re.compile(r"round\([^,\n]*/[^,\n]*,\s*\d\)")

IRRATIONAL = "IRRATIONAL"
EXACT_DP = "EXACT_DP"
FLOAT_DATA = "FLOAT_DATA"
COMPOUND_RATIONAL = "COMPOUND_RATIONAL"

ALLOWED: dict[tuple[str, str], str] = {
    ("operators/analytics.py", "q_cube_pricing"): EXACT_DP,  # cents/100
    ("operators/analytics.py", "q_events_attribution_sql"): FLOAT_DATA,
    ("operators/analytics.py", "q_events_latest_by_sql"): EXACT_DP,  # us/1e6
    ("operators/analytics.py", "q_events_twap_sql"): FLOAT_DATA,
    ("operators/analytics.py", "q_sql_lambda_arrays_sql"): FLOAT_DATA,
    ("operators/analytics.py", "q_sql_try_arithmetic_sql"): FLOAT_DATA,
    ("operators/analytics.py", "sample_neyman_allocation"): IRRATIONAL,  # wh = N·σ
    ("operators/analytics.py", "sample_neyman_allocation_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_anova_sql"): FLOAT_DATA,  # SS of double values
    ("operators/analytics.py", "stats_benford_second"): IRRATIONAL,  # minus log10 literal
    ("operators/analytics.py", "stats_benford_second_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_chi_square_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_cochran_armitage"): IRRATIONAL,  # z over sqrt
    ("operators/analytics.py", "stats_cochran_armitage_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_deming_regression"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_deming_regression_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_durbin_watson"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_durbin_watson_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_elasticity_loglog"): IRRATIONAL,  # ln sums
    ("operators/analytics.py", "stats_elasticity_loglog_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_entropy_rate_markov"): IRRATIONAL,
    ("operators/analytics.py", "stats_entropy_rate_markov_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_geometric_mean"): IRRATIONAL,  # exp(mean ln)
    ("operators/analytics.py", "stats_geometric_mean_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_granger_daily"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_hill_tail"): IRRATIONAL,  # ln sums
    ("operators/analytics.py", "stats_hill_tail_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_hurst_exponent"): IRRATIONAL,  # ln-ln OLS
    ("operators/analytics.py", "stats_hurst_exponent_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_kruskal_wallis"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_kruskal_wallis_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_log_rank"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_log_rank_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_mann_whitney"): EXACT_DP,  # u2/2 ends .0/.5
    ("operators/analytics.py", "stats_mann_whitney_sql"): EXACT_DP,
    ("operators/analytics.py", "stats_poisson_rate_test"): IRRATIONAL,  # ln/sqrt z
    ("operators/analytics.py", "stats_poisson_rate_test_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_power_analysis"): IRRATIONAL,  # sqrt in num
    ("operators/analytics.py", "stats_power_analysis_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_price_index_sql"): IRRATIONAL,  # fisher sqrt
    ("operators/analytics.py", "stats_qq_normal_sql"): IRRATIONAL,  # /sd sqrt
    ("operators/analytics.py", "stats_retention_halflife"): IRRATIONAL,  # ln2/slope
    ("operators/analytics.py", "stats_retention_halflife_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_runs_test"): IRRATIONAL,  # z over sqrt
    ("operators/analytics.py", "stats_runs_test_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_seasonal_decompose_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_spectral_peak"): IRRATIONAL,  # cos/sin sums
    ("operators/analytics.py", "stats_spectral_peak_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_two_way_anova"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_two_way_anova_sql"): COMPOUND_RATIONAL,
    ("operators/corpus.py", "corpus_dsir_weights_sql"): IRRATIONAL,  # ln-ratio sums
    ("operators/corpus.py", "corpus_lang_purity"): IRRATIONAL,  # entropy
    ("operators/corpus.py", "corpus_lang_purity_sql"): IRRATIONAL,
    ("operators/graph.py", "graph_bipartite_projection"): IRRATIONAL,  # /sqrt·sqrt
    ("operators/graph.py", "graph_bipartite_projection_sql"): IRRATIONAL,
    ("operators/multimodal.py", "_frame_sample_batch"): FLOAT_DATA,  # float durations
    ("operators/multimodal.py", "mm_aspect_buckets"): IRRATIONAL,  # ln ratio
    ("operators/multimodal.py", "mm_aspect_buckets_sql"): IRRATIONAL,
    ("operators/multimodal.py", "mm_byte_entropy"): IRRATIONAL,
    ("operators/multimodal.py", "mm_byte_entropy_sql"): IRRATIONAL,
    ("operators/similarity.py", "emb_centroid_drift"): IRRATIONAL,  # cos over sqrt
    ("operators/similarity.py", "emb_centroid_drift_sql"): IRRATIONAL,
    ("operators/similarity.py", "emb_dim_relevance"): FLOAT_DATA,
    ("operators/similarity.py", "emb_dim_relevance_sql"): FLOAT_DATA,
    ("operators/similarity.py", "emb_intrinsic_dim"): IRRATIONAL,  # ln-ratio sums
    ("operators/similarity.py", "emb_intrinsic_dim_sql"): IRRATIONAL,
    ("operators/similarity.py", "emb_isotropy"): FLOAT_DATA,  # cos² sums
    ("operators/similarity.py", "emb_isotropy_sql"): FLOAT_DATA,
    ("operators/similarity.py", "emb_lsh_tuning_sql"): IRRATIONAL,  # cos over sqrt
    ("operators/similarity.py", "emb_pca_power_sql"): IRRATIONAL,  # /sqrt norm
    ("operators/similarity.py", "emb_variance_spectrum"): FLOAT_DATA,
    ("operators/similarity.py", "emb_variance_spectrum_sql"): FLOAT_DATA,
    ("operators/textstats.py", "stats_entropy_per_source_sql"): IRRATIONAL,
    ("operators/textstats.py", "text_collocations"): IRRATIONAL,  # ln of ratio
    ("operators/textstats.py", "text_collocations_sql"): IRRATIONAL,
    ("operators/textstats.py", "text_conditional_entropy"): IRRATIONAL,
    ("operators/textstats.py", "text_conditional_entropy_sql"): IRRATIONAL,
    ("operators/textstats.py", "text_heaps_law"): IRRATIONAL,  # exp of OLS
    ("operators/textstats.py", "text_heaps_law_sql"): IRRATIONAL,
    ("operators/textstats.py", "text_zipf_fit_sql"): IRRATIONAL,  # log-log OLS
}


def _census() -> dict[tuple[str, str], int]:
    found: dict[tuple[str, str], int] = collections.defaultdict(int)
    for mod in MODULES:
        path = PKG / mod
        if not path.exists():
            continue
        fn = "?"
        for line in path.read_text().splitlines():
            m = re.match(r"def (\w+)", line)
            if m:
                fn = m.group(1)
            for _ in PAT.finditer(line):
                found[(mod, fn)] += 1
    return found


def test_no_unallowlisted_round_division():
    found = _census()
    new = sorted(set(found) - set(ALLOWED))
    assert not new, (
        "NEW raw round(<division>, k) site(s): "
        + ", ".join(f"{f}:{fn}" for f, fn in new)
        + " — if p and q are integer-exact use functions/exact.py "
        "(sp_rat/dk_rat); otherwise allowlist with a category."
    )


def test_no_stale_allowlist_entries():
    found = _census()
    stale = sorted(set(ALLOWED) - set(found))
    assert not stale, (
        "stale allowlist entries (site no longer present): "
        + ", ".join(f"{f}:{fn}" for f, fn in stale)
    )
