"""SQL surface parity with the reference's catalog-table workflow.

The reference is a notebook pipeline whose consumers read NAMED catalog
tables — `spark.table('transactions_adj')` (02_Initialize_Solution.py:40,
04a_Task__Feature_Engineering.py:76), `%sql SELECT * FROM transactions_adj`
(01_Data_Prep.py:171), `.table('commodities_to_score')`,
`.table('products')`, the three feature tables, and the published
`household_commodity_propensities__PIVOTED/__UNPIVOTED` outputs
(04c_Task__Propensity_Estimation.py:274-286). A user migrating from the
reference has existing SQL written against exactly those names.

`register_views` exposes this engine's equivalents under the SAME names
as session-scoped temp views, so that SQL keeps working verbatim:

    register_views(spark, sf_dir)
    spark.sql("SELECT commodity_desc, count(*) FROM transactions_adj "
              "GROUP BY 1").show()

Views are LAZY — registering costs nothing; each query plans against the
underlying parquet scans with full pushdown, identical to calling the
Python API. Published-score views are only registered when a pipeline
output directory is supplied (they require a prior `Pipeline.publish`).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from propensity_spark.io import TABLES
from propensity_spark.io import register_views as _register_fixture_views

def _derived_builders():
    # imported lazily: relational/features pull in the full operator
    # library, which sql.py users may not otherwise need at import time
    from propensity_spark.operators.features import (
        q_commodity_features,
        q_household_commodity_features,
        q_household_features,
    )
    from propensity_spark.operators.relational import (
        brand_dim,
        commodities_control,
        q_labels,
        silver_transactions,
    )

    return {
        "transactions_adj": silver_transactions,  # 01_Data_Prep.py:123
        "products": brand_dim,  # 01_Data_Prep.py:75-82 analog
        "commodities_to_score": commodities_control,  # 02:58-68
        "household_features": q_household_features,  # 04a:612-620
        "commodity_features": q_commodity_features,
        "household_commodity_features": q_household_commodity_features,
        # the reference keeps labels in-memory (04b:106-163); exposing
        # them as a view is a strict convenience superset
        "household_commodity_labels": q_labels,
    }


def register_views(
    spark: SparkSession, sf_dir: str, pipeline_out: str | None = None
) -> list[str]:
    """Register the raw fixture tables plus the reference-named derived
    views. Returns the registered view names. Pass the `Pipeline` output
    directory to also expose the published score tables under their
    reference names."""
    _register_fixture_views(spark, sf_dir)  # io.py's raw-table views
    registered = list(TABLES)
    for name, builder in _derived_builders().items():
        builder(spark, sf_dir).createOrReplaceTempView(name)
        registered.append(name)
    if pipeline_out is not None:
        from pathlib import Path

        out = Path(pipeline_out)
        for name, sub in (
            ("household_commodity_propensities__PIVOTED", "propensities_pivoted"),
            ("household_commodity_propensities__UNPIVOTED", "propensities_unpivoted"),
        ):
            path = out / sub
            if path.exists():
                # mergeSchema mirrors Pipeline.read_published: an
                # incremental publish can widen newer day partitions
                # with a new commodity column; a footer-sampled schema
                # would randomly miss it
                spark.read.option("mergeSchema", "true").parquet(
                    str(path)
                ).createOrReplaceTempView(name)
                registered.append(name)
    return registered


def query(spark: SparkSession, sql: str, **params):
    """Parameterized SQL against the registered views: named `:param`
    markers bound server-side (Spark 4 parameter binding), so caller
    values are never string-interpolated into the query — the
    injection-safe surface a scheduler or API endpoint should call
    instead of f-strings:

        query(spark, "SELECT * FROM transactions_adj "
                     "WHERE day BETWEEN :lo AND :hi", lo=d0, hi=d1)
    """
    return spark.sql(sql, args=params)
