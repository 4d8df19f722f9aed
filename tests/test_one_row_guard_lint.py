"""Static lint for the single-row (n=1) DIVIDE_BY_ZERO class.

Round 9-10 found 44 registry keys crashing with ANSI DIVIDE_BY_ZERO on
1-row inputs, every one a ``/(n - 1)``-style variance/correlation
denominator: a statistic over a 1-row series/group must emit NULL (via
a nullif or CASE-guard mirrored on BOTH engines), not kill the job —
at 100 TB, filters and per-segment grouping WILL produce 1-row groups.

The DYNAMIC gate for the class is the full-registry single-row sweep
(``SWEEP_ONE=1 scripts/sweep.py`` — 552/552 green, empty allowlist as
of round 10). This lint is the cheap static tripwire in front of it:
any NEW ``/ (x - 1)`` divisor shape — in an operator function body or
in the rendered oracle SQL — fails here until the op is (a) guarded on
both engines and (b) re-proven by the single-row sweep, at which point
it is allowlisted with that proof as the reason.

Every entry below is sweep-proven: either its denominator is guarded
(nullif / CASE with the degenerate condition) or structurally nonzero
at n=1 (constant literals, bounded grids, upstream filters). Stale
entries (allowlisted but no longer matching) also fail, so the lists
stay in sync with the code.
"""

from __future__ import annotations

import collections
import re

from tests.test_round_boundary_lint import MODULES, PKG, _normalize

# divisor shapes that hit zero on a 1-row group: "/ (x - 1)",
# "/ (x - 1.0)", "/ (count(*) - 1.0)", "/ (n * (n - 1.0))", and — the
# r10 ADVICE blind spot — compound (parenthesized-sum or bare-sum)
# subtrahend bases like "/ ((n_a + n_b) * (n_a + n_b - 1.0))" or
# "/ (n_a + n_b - 1)" that the single-token pattern let through.
_NBASE = r"(?:count\(\*\)|\([\w.\s+*-]+\)|[\w.]+(?:\s*\+\s*[\w.]+)*)"
NPAT = re.compile(
    rf"/\s*\(\s*(?:{_NBASE}\s*\*\s*\(\s*)?{_NBASE}"
    r"\s*-\s*1(?:\.0)?\s*\)"
)

# (module, function) -> why the site survives a 1-row input.
# GUARDED = a CASE/nullif/when with the degenerate condition wraps it;
# NONZERO = the subtrahend base is structurally > 1 at n=1 (bounded
# grids, constant literals, upstream HAVING/where floors).
GUARDED = "guarded (CASE/nullif, mirrored both engines)"
NONZERO = "denominator structurally nonzero at n=1"
SRC_ALLOWED: dict[tuple[str, str], str] = {
    ("operators/analytics.py", "stats_anova"): GUARDED,
    ("operators/analytics.py", "stats_anova_sql"): GUARDED,
    ("operators/analytics.py", "stats_ansari_bradley"): GUARDED,
    ("operators/analytics.py", "stats_ansari_bradley_sql"): GUARDED,
    ("operators/analytics.py", "stats_bland_altman"): GUARDED,
    ("operators/analytics.py", "stats_bland_altman_sql"): GUARDED,
    ("operators/analytics.py", "stats_brunner_munzel"): GUARDED,
    ("operators/analytics.py", "stats_brunner_munzel_sql"): GUARDED,
    ("operators/analytics.py", "stats_cpk"): GUARDED,
    ("operators/analytics.py", "stats_cpk_sql"): GUARDED,
    ("operators/analytics.py", "stats_cramers_v"): GUARDED,
    ("operators/analytics.py", "stats_cramers_v_sql"): GUARDED,
    ("operators/analytics.py", "stats_cuped"): GUARDED,
    ("operators/analytics.py", "stats_cuped_sql"): GUARDED,
    ("operators/analytics.py", "stats_dunn_posthoc"): GUARDED,
    ("operators/analytics.py", "stats_dunn_posthoc_sql"): GUARDED,
    ("operators/analytics.py", "stats_extreme_gumbel"): GUARDED,
    ("operators/analytics.py", "stats_extreme_gumbel_sql"): GUARDED,
    ("operators/analytics.py", "stats_geometric_mean"): NONZERO,
    ("operators/analytics.py", "stats_geometric_mean_sql"): NONZERO,
    ("operators/analytics.py", "stats_grubbs"): GUARDED,
    ("operators/analytics.py", "stats_grubbs_sql"): GUARDED,
    ("operators/analytics.py", "stats_levene"): GUARDED,
    ("operators/analytics.py", "stats_levene_sql"): GUARDED,
    ("operators/analytics.py", "stats_log_rank"): GUARDED,
    ("operators/analytics.py", "stats_log_rank_sql"): GUARDED,
    ("operators/analytics.py", "stats_lognormal_fit"): GUARDED,
    # compound-sum subtrahend sites, visible since the r11 NPAT
    # extension; guards are the r10 campaign's exact-integer
    # tie_term < N³−N discriminants, sweep-proven at n=1/2/3/desc
    ("operators/analytics.py", "stats_mann_whitney"): GUARDED,
    ("operators/analytics.py", "stats_mann_whitney_sql"): GUARDED,
    ("operators/analytics.py", "stats_mahalanobis_outliers"): GUARDED,
    ("operators/analytics.py", "stats_mahalanobis_outliers_sql"): GUARDED,
    ("operators/analytics.py", "stats_mood_scale"): GUARDED,
    ("operators/analytics.py", "stats_mood_scale_sql"): GUARDED,
    ("operators/analytics.py", "stats_tost_equivalence"): GUARDED,
    ("operators/analytics.py", "stats_weibull_fit"): GUARDED,
    ("operators/analytics.py", "stats_weibull_fit_sql"): GUARDED,
    ("operators/analytics.py", "stats_welch_t"): GUARDED,
    ("operators/analytics.py", "stats_welch_t_sql"): GUARDED,
    ("operators/similarity.py", "emb_isotropy"): GUARDED,
    ("operators/similarity.py", "emb_isotropy_sql"): GUARDED,
    ("operators/similarity.py", "emb_norm_by_label"): GUARDED,
    ("operators/similarity.py", "emb_norm_by_label_sql"): GUARDED,
    ("operators/similarity.py", "emb_outlier_zscore"): GUARDED,
    ("operators/similarity.py", "emb_outlier_zscore_sql"): GUARDED,
    ("operators/similarity.py", "emb_variance_spectrum"): GUARDED,
    ("operators/similarity.py", "emb_variance_spectrum_sql"): GUARDED,
    ("operators/similarity.py", "emb_whitening"): GUARDED,
    ("operators/similarity.py", "emb_whitening_sql"): GUARDED,
}

# rendered oracle SQL (f-strings resolved) — registry key -> reason
RENDERED_ALLOWED: dict[str, str] = {
    "emb_isotropy": GUARDED,
    "emb_norm_by_label": GUARDED,
    "emb_outlier_zscore": GUARDED,
    "emb_variance_spectrum": GUARDED,
    "emb_whitening": GUARDED,
    "stats_anova": GUARDED,
    "stats_ansari_bradley": GUARDED,
    "stats_bland_altman": GUARDED,
    "stats_blb_ci": NONZERO,  # fixed replicate count literal
    "stats_brunner_munzel": GUARDED,
    "stats_cpk": GUARDED,
    "stats_cramers_v": GUARDED,
    "stats_cuped": GUARDED,
    "stats_dunn_posthoc": GUARDED,
    "stats_extreme_gumbel": GUARDED,
    "stats_geometric_mean": NONZERO,
    "stats_grubbs": GUARDED,
    "stats_levene": GUARDED,
    "stats_ljung_box": GUARDED,
    # compound-sum subtrahend oracles, visible since the r11 NPAT
    # extension (guards mirrored in the SQL; sweep-proven n=1/2/3/desc)
    "stats_log_rank": GUARDED,
    "stats_mann_whitney": GUARDED,
    "stats_mann_whitney_u": GUARDED,
    "stats_mann_whitney_z": GUARDED,
    "stats_mahalanobis_outliers": GUARDED,
    "stats_mood_scale": GUARDED,
    "stats_two_way_anova": GUARDED,
    "stats_weibull_fit": GUARDED,
    "stats_welch_t": GUARDED,
}


def _src_census() -> dict[tuple[str, str], int]:
    found: dict[tuple[str, str], int] = collections.defaultdict(int)
    for mod in MODULES:
        path = PKG / mod
        if not path.exists():
            continue

        def flush(fn: str, body: list[str]) -> None:
            if not body:
                return
            n = len(NPAT.findall(_normalize("\n".join(body))))
            if n:
                found[(mod, fn)] += n

        fn = "?"
        body: list[str] = []
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
        n = len(NPAT.findall(_normalize(sql)))
        if n:
            found[name] += n
    return found


def test_no_unallowlisted_n_minus_one_divisor():
    new = sorted(set(_src_census()) - set(SRC_ALLOWED))
    assert not new, (
        "NEW '/(x - 1)'-shaped divisor site(s): "
        + ", ".join(f"{f}:{fn}" for f, fn in new)
        + " — guard with nullif/CASE on BOTH engines (a 1-row group "
        "must yield NULL, not ANSI DIVIDE_BY_ZERO), re-prove with "
        "SWEEP_ONE=1 scripts/sweep.py, then allowlist with the reason."
    )


def test_no_stale_src_entries():
    stale = sorted(set(SRC_ALLOWED) - set(_src_census()))
    assert not stale, (
        "stale SRC_ALLOWED entries (site no longer present): "
        + ", ".join(f"{f}:{fn}" for f, fn in stale)
    )


def test_no_unallowlisted_rendered_n_minus_one_divisor():
    new = sorted(set(_rendered_census()) - set(RENDERED_ALLOWED))
    assert not new, (
        "NEW rendered '/(x - 1)' divisor in oracle SQL for: "
        + ", ".join(new)
        + " — guard both engines, re-prove with SWEEP_ONE=1, allowlist."
    )


def test_no_stale_rendered_entries():
    stale = sorted(set(RENDERED_ALLOWED) - set(_rendered_census()))
    assert not stale, (
        "stale RENDERED_ALLOWED entries (oracle no longer matches): "
        + ", ".join(stale)
    )


def test_pattern_catches_the_proven_shapes():
    """The divisor shapes the r9/r10 probes actually found, including
    the compound-sum bases the r10 ADVICE flagged as lint-invisible."""
    for snippet in (
        "sqrt((n * sll - sl * sl) / (n * (n - 1.0)))",
        "(ssb / (k - 1))",
        "x / (count(*) - 1.0)",
        "(tot_s - s) / (tot_n - 1)",
        # compound subtrahend bases (stats_mann_whitney / stats_runs_test
        # class) — single-token NPAT missed these through round 10
        "u / ((n_a + n_b) * (n_a + n_b - 1.0))",
        "s / (n_a + n_b - 1)",
        "v / ((n1 + n2) - 1.0)",
    ):
        assert NPAT.search(_normalize(snippet)), snippet
    # guarded or unrelated forms must NOT match
    for snippet in (
        "x / nullif(n - 1, 0)",
        "x / (n + 1)",
        "shiftleft(1, idx - 1)",
    ):
        assert not NPAT.search(_normalize(snippet)), snippet
