"""Assert the corpus-wide 2-decimal-lattice precondition (ADVICE r11).

Several operators (stats_anova, stats_fdr_bh, stats_tost_equivalence,
stats_two_way_anova, the correlation/regression family) decide statistic
DEFINEDNESS from integer-cents moments — ``round(v * 100)`` — which is
exact only while every money/value column sits on the hundredths
lattice. This test pins that precondition once per corpus so a future
testdata change that moves values off the lattice fails loudly here
instead of silently redefining zero-variance guards.

Pure-DuckDB (no Spark session): reads the same parquet the engines read.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
           if os.path.isdir(d)]

# every DOUBLE value column the integer-cents guards touch
_LATTICE_COLS = {
    "events.parquet": ["value"],
    "orders.parquet": ["o_totalprice"],
    "lineitem.parquet": ["l_quantity", "l_extendedprice", "l_discount",
                         "l_tax"],
    "customer.parquet": ["c_acctbal"],
    "supplier.parquet": ["s_acctbal"],
    "part.parquet": ["p_retailprice"],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_value_columns_on_2dp_lattice(sf_dir: str) -> None:
    con = duckdb.connect()
    for table, cols in _LATTICE_COLS.items():
        path = os.path.join(sf_dir, table)
        if not glob.glob(path):
            continue
        for col in cols:
            # tolerance: double representation of an on-lattice value
            # leaves |v*100 - round(v*100)| ≈ |v*100|·eps ≲ 1e-8 at
            # these magnitudes; genuine sub-cent data would sit ≫ 1e-4
            # away. Anything inside the band rounds unambiguously.
            off = con.execute(
                f"SELECT count(*) FROM '{path}' "
                f'WHERE "{col}" IS NOT NULL '
                f'AND abs("{col}" * 100 - round("{col}" * 100)) > 1e-4'
            ).fetchone()[0]
            assert off == 0, (
                f"{table}.{col} at {sf_dir}: {off} values off the "
                "2dp lattice — the integer-cents definedness guards "
                "(stats_anova family) assume hundredth quantization"
            )
